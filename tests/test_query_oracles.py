"""In-suite mini replica of the driver's correctness gate: a representative
subset of oracle-checked queries run at sf0.001 and compared value-for-value
against their DuckDB SQL (full set: scripts/check_correctness.py)."""

import duckdb
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

SUBSET = [
    "groupby_agg", "topk_users", "join_nation_region", "minute_resample",
    "exact_dedup", "velocity_bins", "grid_cells", "knn_centers",
    "pip_rect_join", "sessionize", "daily_user_metrics", "text_stats",
    "quality_scores", "ann_topk", "impute_points", "cell_dedup",
    "pages_label_stats", "pages_daily_features", "pages_entries",
    "hourly_weather", "weather_daily", "daily_value_quantiles",
    "s2_tiles", "hex_tiles", "minhash_dedup", "pages_clusters",
    "quality_filter", "repetition_filter", "substring_dedup",
    "vocab_topk", "stratified_sample", "ngram_jaccard",
    "pack_sequences", "decontaminate", "tfidf_topterms",
    "hll_distinct", "range_join", "pagerank",
    "cms_heavy_hitters", "triangle_count", "audio_features",
    "video_frames", "fuzzy_dedup",
    "bloom_semi_join", "per_group_topk", "rollup_sales", "pivot_events",
    "local_revenue", "running_total", "funnel_counts",
    "histogram_quantiles", "outlier_filter", "png_features",
    "partition_prune", "zorder_layout", "interval_coverage",
    "balanced_ranges", "components", "hex_rollup",
    "trajectory_simplify", "skyline", "pmi_bigrams", "snapshot_diff",
    "line_dedup", "geohash_tiles",
    "pip_poly_join", "convex_hull", "full_outer_join", "distance_join",
    "od_flows", "tile_stays", "covisit_pairs", "bearing_sectors",
    "moran_components", "domain_stats",
    "polygon_areas", "cell_smooth", "snap_points", "ntile_values", "set_ops",
    "ols_components", "systematic_sample", "knox_pairs", "cell_growth",
    "kmeans_rounds", "radius_gyration", "exploration_curve",
    "time_weighted_avg", "html_links", "bigram_lm_scores", "ccnet_buckets",
    "getis_ord_components", "dataset_split", "weighted_sample",
    "url_blocklist_filter", "kmv_distinct", "unpivot_measures",
    "late_data_drop", "event_transitions", "corpus_grep",
    "embedding_centroids", "session_path_topk", "table_profile",
    "link_pagerank", "edge_support", "k_core_rounds",
    "hilbert_layout", "quadkey_tiles", "dense_rank_windows",
    "prefix_drift", "autocorr_components", "cube_counts", "mad_values",
    "bm25_topk", "phrase_search", "day_bitmask",
    "link_bfs_hops", "embedding_gram", "typo_pairs",
    "global_concurrency", "partition_checksums", "spearman_components",
    "basket_lift", "ks_distance", "event_islands",
    "cell_regions", "degree_assortativity", "theil_sen_components",
    "knn_join", "conversion_latency",
    "two_hop_counts", "polygon_raster", "delta_encoding_stats",
    "mis_rounds", "path_counts", "url_lcp_stats",
    "pq_codes", "merge_upsert", "ohlc_bars",
    "rect_overlap_join", "segment_crossings", "gap_fill",
    "scd2_intervals", "tree_rollup", "chunk_windows", "kmv_intersect",
    "hausdorff_split", "exact_median", "sentence_stats",
    "polyline_buffer", "hits_scores", "feature_hash",
    "reciprocal_links", "k_anonymity", "benford_digits",
    "adaptive_tiles", "encoding_stats", "interval_slot_join",
    "coverage_k", "tokenizer_fertility", "char_trigrams",
    "hilbert_range_query", "langid_confusion", "jackknife_sums",
    "rect_union_area", "graph_diameter_lb", "char_collision_mass",
    "grid_transitions", "winsorized_sums", "ship_latency_hist",
    "ri_audit", "modularity_components", "distance_histogram",
    "gini_components", "anova_components", "runs_test",
    "cusum_changepoint", "sssp_rounds", "scc_components",
    "polygon_centroids", "group_diameter", "phonetic_buckets",
    "bootstrap_sums", "chi2_cells", "rake_keywords",
    "haar_pyramid", "ewma_floor", "winnow_select",
    "zonal_stats", "power_iteration", "sinuosity_components",
    "sorted_neighborhood_pairs",
    "grouping_sets", "l_diversity", "clustering_coeff",
    "dag_layers", "mutual_nn",
    "lorenz_deciles", "inversion_counts",
    "idw_estimate", "xcorr_lags", "set_cover_greedy",
    "mmr_select", "value_band_join",
    "rolling_ols", "skip_bigrams",
    "hampel_outliers", "ppr_rounds",
    "truss_peel", "sde_components", "roc_points",
    "viterbi_cost", "emd_1d",
    "source_jaccard", "largest_rectangle",
    "lis_lengths", "mase_components",
    "qq_deciles", "quadrat_csr",
    "link_prediction_cn", "clark_evans_components",
    "window_distinct_types", "token_sort_signature",
]


@pytest.fixture(scope="module")
def duck(ray_session):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, duck):
    from check_correctness import canon, compare, to_pandas

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    ray_df = to_pandas(QUERIES[name](SF_DIR))
    # /tmp-dump oracles (labeled/pages/emb_aug) hardcode the driver's
    # sf0.01 path; retarget every such artifact at this module's sf
    sql = ORACLE_SQL[name].replace("sf0.01", "sf0.001")
    sql_df = duck.sql(sql).df()
    msg = compare(name, ray_df, sql_df)
    assert msg is None, msg
