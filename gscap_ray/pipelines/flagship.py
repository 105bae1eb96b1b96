"""Flagship pipeline: pages -> geocode -> tiles -> context enrichment ->
per-host stream labeling -> entries / daily features / cluster tables.

Ray-Data mapping of the reference's canonical flow (SURVEY.md §3.1,
gps.py demo notebook cells 2-10):

    read_parquet(pages, columns=...)            # prune: html never read
      -> map_batches(geocode_batch)             # stateless, zero-copy Arrow
      -> map_batches(tile_batch)                # S2/H3-style/grid cell ids
      -> map_batches(PipEnricher, concurrency=N)  # actor pool, broadcast layer
      -> groupby(host).map_groups(label_host)   # shuffle #1 (key = host):
                                                #   velocity -> clusters ->
                                                #   cid + distance_from_home
      -> write_parquet(partition by part_key)   # resumable unit
    entries  = labeled.groupby(host).map_groups(cluster_times)
    daily    = labeled.groupby(host).map_groups(daily_metrics)   # (host,date)
    clusters = labeled.groupby(host,cid).aggregate(mean/count)   # small table

Scale notes: the single wide shuffle is the host groupby; `text` travels
through it exactly once (html is never read). Cluster tables and feature
tables are small. Per-host DBSCAN state never leaves the group; the polygon
layer is broadcast via ray.put once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.stream import (
    cluster_times,
    clusters_with_context,
    daily_metrics,
    velocity_frame,
)
from ..stages.enrich import PipEnricher
from ..stages.geocode import geocode_batch, tile_batch

PAGE_COLUMNS = ["url", "warc_ts", "text", "lang"]


def label_host_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-host: velocity features + cluster context labels (M3 + C4)."""
    g = g.rename(columns={"warc_ts": "ts"})
    vf = velocity_frame(g)
    records, _clusters = clusters_with_context(vf)
    return records.rename(columns={"ts": "warc_ts"})


def entries_host_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-host sessionization (C6) -> entries table rows."""
    from ..functions.gazetteer import tz_from_dd

    g = g.rename(columns={"warc_ts": "ts"})
    g["date"] = g["ts"].dt.date
    e = cluster_times(g, tz_lookup=tz_from_dd)
    if len(e) == 0:
        return pd.DataFrame()
    host = g["host"].iloc[0]
    return pd.DataFrame({
        "host": host,
        "cid": e["cid"].astype(str),
        "date": e["date"].astype(str),
        "time_in": e["time_in"],
        "midpoint": e["midpoint"],
        "time_out": e["time_out"],
        "duration_s": e["duration"].dt.total_seconds(),
        "pos": e["pos"].astype(np.int64),
        "n_points": e["n_points"].astype(np.int64),
        "lat": e["lat"],
        "lon": e["lon"],
        "local_tz": e["local_tz"].astype(str),
    })


def daily_host_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-host daily metrics (A4) -> (host, date) feature rows."""
    g = g.rename(columns={"warc_ts": "ts"})
    dm = daily_metrics(g)  # derives dates from ts as datetime64[D] (fast path)
    dm.insert(0, "host", g["host"].iloc[0])
    dm["date"] = dm["date"].astype(str)
    return dm


def geocoded_pages(pages_dir: str, columns=None) -> rd.Dataset:
    # batch_size=None -> whole-block zero-copy Arrow batches (these kernels
    # are pure vectorized numpy; per-batch overhead dominates small batches)
    ds = rd.read_parquet(pages_dir, columns=columns or PAGE_COLUMNS)
    ds = ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
    return ds.map_batches(tile_batch, batch_format="pyarrow", batch_size=None)


def _enrich_pool_size() -> tuple[int, int]:
    """Autoscaling PIP actor-pool bounds sized to the cluster: the pool was
    the labeled path's floor at (2, 8) — 40 s of enrich UDF over 8 actors is
    a 5 s serial floor at 32 CPUs. Upscaling is cheap since the broadcast
    enricher makes actor init ~57 ms (unpickle, no index build)."""
    from ..stages.geocode import cluster_cpus

    return (2, max(8, cluster_cpus()))


def labeled_pages(pages_dir: str, polygons: list | None = None,
                  enrich_concurrency=None, config=None) -> rd.Dataset:
    """Full record-level labeling pipeline (lazy Dataset).

    Fast path (VERDICT r1 #5): Arrow host extraction + fused geocode/tile
    (one murmur pass), int ``part_key`` shuffle instead of the string
    ``host`` key, and vectorized in-task host sub-grouping — the same design
    the fused daily path uses, now carrying the full record set (``text``
    passes through the shuffle exactly once, untouched). Partition count is
    derived from the input's footer row count."""
    import functools

    from ..stages.geocode import (
        dataset_num_rows,
        geocode_tile_batch,
        partitions_for,
        read_blocks_for,
    )

    n_rows = dataset_num_rows(pages_dir)
    parts = (config.partitions if config is not None
             and config.partitions is not None else partitions_for(n_rows))
    # few-large-blocks read: the part_key exchange emits one object per
    # (map block x reduce partition); see read_blocks_for
    ds = rd.read_parquet(pages_dir, columns=PAGE_COLUMNS,
                         override_num_blocks=read_blocks_for(n_rows))
    ds = ds.map_batches(functools.partial(geocode_tile_batch,
                                          partitions=parts, config=config),
                        batch_format="pyarrow", batch_size=None)
    if polygons is not None:
        # grid index built once per (layer, session) on the driver, the
        # FINISHED enricher broadcast (unpickle ~8x cheaper than rebuild)
        from ..stages.enrich import broadcast_enricher

        ref = broadcast_enricher(polygons)
        ds = ds.map_batches(PipEnricher, fn_constructor_args=(ref,),
                            batch_format="pyarrow", batch_size=None,
                            concurrency=enrich_concurrency or _enrich_pool_size())
    return ds.groupby("part_key").map_groups(
        functools.partial(label_partition, config=config),
        batch_format="pyarrow")


def label_partition(t: pa.Table, config=None) -> pa.Table:
    """Arrow-in/Arrow-out per-partition labeling (M3 + C4 fused).

    One lexsort by (host_hash, ts) per partition, then the numpy velocity +
    label cores run per host slice — no pandas DataFrame per host, no
    string-key grouping. Every input column passes through via one
    ``Table.take`` (byte identity for ``text`` preserved)."""
    from ..functions.stream import label_core
    from ..functions.velocity import BINS, stream_velocity_features

    if config is None:
        from ..config import DEFAULT as config

    n = t.num_rows
    if n == 0:
        return t
    hh = t["host_hash"].to_numpy()
    ts_us = t["warc_ts"].cast(pa.int64()).to_numpy()
    order = np.lexsort((ts_us, hh))
    t2 = t.take(order)
    hs, te = hh[order], ts_us[order]
    lat = t2["lat"].to_numpy()
    lon = t2["lon"].to_numpy()
    bounds = np.flatnonzero(np.diff(hs))
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [n]])

    disp = np.empty(n)
    td = np.empty(n)
    vel = np.empty(n)
    codes = np.empty(n, dtype=np.int8)
    cid = np.zeros(n, dtype=np.int32)  # CID_XNOT; int codes end-to-end
    dfh = np.full(n, np.nan)
    from ..functions.geo import haversine_m

    for s, e in zip(starts, ends):
        d, tt, v, c = stream_velocity_features(lat[s:e], lon[s:e], te[s:e])
        disp[s:e], td[s:e], vel[s:e], codes[s:e] = d, tt, v, c
        if e - s < 3:
            continue  # cid stays xNot (code 0)
        cidv, home, _work, _cl = label_core(lat[s:e], lon[s:e], te[s:e],
                                            c == 1, eps=config.eps,
                                            min_samples=config.min_samples,
                                            fence=config.fence_m,
                                            build_clusters=False,
                                            return_codes=True)
        cid[s:e] = cidv
        if home is not None:
            dfh[s:e] = haversine_m(home["lat"], home["lon"], lat[s:e], lon[s:e])

    # string columns built with ONE Arrow dictionary take each — no Python
    # object arrays on the widest column of the hottest stage (VERDICT r3 #3)
    from ..functions.stream import cid_lut as _cid_lut

    cid_lut = pa.array(_cid_lut(int(cid.max(initial=2))), pa.string())
    bin_lut = pa.array(list(BINS), pa.string())
    return (t2
            .append_column("displacement", pa.array(disp, pa.float64()))
            .append_column("time_delta", pa.array(td, pa.float64()))
            .append_column("velocity", pa.array(vel, pa.float64()))
            .append_column("binning", bin_lut.take(pa.array(codes, pa.int8())))
            .append_column("cid", cid_lut.take(pa.array(cid, pa.int32())))
            .append_column("distance_from_home", pa.array(dfh, pa.float64())))


def daily_features_direct(pages_dir: str, polygons: list | None = None,
                          enrich_concurrency=None, config=None) -> rd.Dataset:
    """Fused label+daily per-host stage: ONE shuffle instead of two when only
    the daily feature table is needed (the per-host records never leave the
    group).

    Scale design: reads only (url, warc_ts); `url` and the host string are
    dropped right after geocode/tiling so the shuffle carries 5 fixed-width
    numeric columns only (host identity travels as ``host_hash`` int64; the
    hash -> string mapping lives in the labeled_pages output); the shuffle
    key is the int `part_key` (hash(host) % P), and hosts are sub-grouped
    vectorized inside each partition — fewer, larger reduce tasks, no
    string-key sort, no Python-object columns through the exchange. PIP runs
    as stateless tasks with a per-worker cached index (no actor-pool
    startup); its outputs are dropped pre-shuffle here because the daily
    table doesn't consume them (the labeled_pages path keeps them)."""
    import functools

    from ..stages.enrich import make_pip_task
    from ..stages.geocode import (
        dataset_num_rows,
        geocode_tile_batch,
        partitions_for,
        read_blocks_for,
    )

    n_rows = dataset_num_rows(pages_dir)
    parts = (config.partitions if config is not None
             and config.partitions is not None else partitions_for(n_rows))
    ds = rd.read_parquet(pages_dir, columns=["url", "warc_ts"],
                         override_num_blocks=read_blocks_for(n_rows))
    ds = ds.map_batches(functools.partial(geocode_tile_batch,
                                          partitions=parts, config=config),
                        batch_format="pyarrow", batch_size=None)
    if polygons is not None:
        from ..stages.enrich import broadcast_enricher

        ref = broadcast_enricher(polygons)  # memoized prebuilt-index broadcast
        ds = ds.map_batches(make_pip_task(ref), batch_format="pyarrow", batch_size=None)
    ds = ds.select_columns(["host_hash", "part_key", "warc_ts", "lat", "lon"])

    return ds.groupby("part_key").map_groups(
        functools.partial(fused_partition_arrow, config=config),
        batch_format="pyarrow")


def fused_partition_arrow(t: pa.Table, config=None) -> pa.Table:
    """Arrow-in/Arrow-out fused label+daily over one part_key partition.

    Pure numpy end to end: zero-copy column extraction, per-host slices via
    lexsort, velocity codes stay int8, and NO pandas anywhere — per-host
    outputs are plain ndarray dicts accumulated into one np.concatenate +
    one Arrow table per partition (the per-host DataFrame construction and
    pd.concat were the stage's allocator/bandwidth hotspot at 32 cores;
    VERDICT r1 #7)."""
    import pandas as pd_  # factorize only (C hash path)

    from ..functions.stream import daily_core_arrays, label_core
    from ..functions.velocity import stream_velocity_features

    if config is None:
        from ..config import DEFAULT as config

    n = t.num_rows
    if n == 0:
        return pa.table({})
    host = t["host_hash"].to_numpy()
    ts_us = t["warc_ts"].cast(pa.int64()).to_numpy()
    lat = t["lat"].to_numpy()
    lon = t["lon"].to_numpy()
    hcodes, hkeys = pd_.factorize(host)
    order = np.lexsort((ts_us, hcodes))
    hs, te, la, lo = hcodes[order], ts_us[order], lat[order], lon[order]
    bounds = np.flatnonzero(np.diff(hs))
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [n]])

    host_chunks: list[np.ndarray] = []
    date_chunks: list[np.ndarray] = []
    col_chunks: dict[str, list[np.ndarray]] = {}
    for s, e in zip(starts, ends):
        tu, ll, lo2 = te[s:e], la[s:e], lo[s:e]
        disp, td, vel, codes = stream_velocity_features(ll, lo2, tu)
        cid, home, work, _clusters = label_core(ll, lo2, tu, codes == 1,
                                                eps=config.eps,
                                                min_samples=config.min_samples,
                                                fence=config.fence_m,
                                                build_clusters=False,
                                                return_codes=True)
        dcodes, dates = pd_.factorize(tu // np.int64(86_400_000_000), sort=True)
        day_dates = np.asarray(dates * 86_400_000_000).astype("datetime64[us]").astype("datetime64[D]")
        dates_a, cols = daily_core_arrays(tu, ll, lo2, td, disp, codes, cid,
                                          dcodes, day_dates)
        host_chunks.append(np.full(dates_a.shape[0], hkeys[hs[s]], np.int64))
        date_chunks.append(dates_a)
        for k, v in cols.items():
            col_chunks.setdefault(k, []).append(np.asarray(v))
    date_all = np.concatenate(date_chunks)
    arrays = {
        "host_hash": pa.array(np.concatenate(host_chunks), pa.int64()),
        "date": pa.array(np.datetime_as_string(date_all, unit="D")),
    }
    for k, chunks in col_chunks.items():
        arrays[k] = pa.array(np.concatenate(chunks))
    return pa.table(arrays)


def run_checkpointed(pages_dir: str, out_dir: str, input_fingerprint: str,
                     polygons: list | None = None,
                     enrich_concurrency: int | tuple | None = None,
                     config=None) -> dict:
    """Checkpointed flagship run: completed partitions are filtered out
    right after tiling (cheap), the rest flow through enrichment + labeling
    and are written atomically with per-partition manifests."""
    import functools

    from ..state.checkpoint import (
        completed_partitions,
        filter_out_partitions,
        run_partitioned,
    )

    from ..stages.geocode import (
        dataset_num_rows,
        geocode_tile_batch,
        partitions_for,
        read_blocks_for,
    )
    from ..state.checkpoint import run_is_complete

    n_rows = dataset_num_rows(pages_dir)
    parts = (config.partitions if config is not None
             and config.partitions is not None else partitions_for(n_rows))
    # partition count rides along so manifests written under a different
    # layout (e.g. a changed partitions_for target) never validate
    done = completed_partitions(out_dir, input_fingerprint, parts)
    if run_is_complete(out_dir, input_fingerprint, done, parts) or len(done) >= parts:
        # prior run drained fully for this input: nothing to read at all
        return {"partitions": 0, "written": 0, "skipped": 0,
                "rows_written": 0, "skipped_at_read": len(done)}
    ds = rd.read_parquet(pages_dir, columns=PAGE_COLUMNS,
                         override_num_blocks=read_blocks_for(n_rows))
    ds = ds.map_batches(functools.partial(geocode_tile_batch,
                                          partitions=parts, config=config),
                        batch_format="pyarrow", batch_size=None)
    ds = filter_out_partitions(ds, done)
    if polygons is not None:
        from ..stages.enrich import broadcast_enricher

        ref = broadcast_enricher(polygons)  # memoized prebuilt-index broadcast
        ds = ds.map_batches(PipEnricher, fn_constructor_args=(ref,),
                            batch_format="pyarrow",
                            concurrency=enrich_concurrency or _enrich_pool_size())
    # ONE groupby: labeling runs inside the write task via the sink's
    # ``transform`` hook, so partition rows (text included) cross the
    # exchange exactly once instead of label-shuffle -> write-shuffle.
    summary = run_partitioned(ds, out_dir, input_fingerprint, parts,
                              transform=functools.partial(label_partition,
                                                          config=config),
                              done=done)
    summary["skipped_at_read"] = len(done)
    return summary


ENTRIES_PARTITIONS = 256


def _add_part_key(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Append an int partition key derived from the host string so the
    downstream shuffle exchanges a uint32 instead of sorting host strings
    (VERDICT r2 #6). Recomputed from `host` rather than reusing a
    possibly-present part_key column: cheap (one murmur pass per batch)
    and works for callers reading the labeled dump, which drops it."""
    from ..stages.geocode import hash64

    ds = ds.select_columns(cols)

    def add_pk(t: pa.Table) -> pa.Table:
        hh = hash64(t["host"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "part_key",
            pa.array((hh % np.uint64(ENTRIES_PARTITIONS)).astype(np.uint32),
                     pa.uint32()))

    return ds.map_batches(add_pk, batch_format="pyarrow", batch_size=None)


def _apply_per_host(per_host_fn, g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized in-task host sub-grouping for one part_key partition:
    factorize (C hash) + one stable argsort, then the per-host pandas
    kernel runs per contiguous slice — the fused_partition_arrow pattern,
    replacing one Ray group (and reduce task) per host string."""
    if len(g) == 0:
        return pd.DataFrame()
    codes, _ = pd.factorize(g["host"].values)
    order = np.argsort(codes, kind="stable")
    g = g.iloc[order].reset_index(drop=True)
    codes = codes[order]
    bounds = np.flatnonzero(np.diff(codes))
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [len(codes)]])
    outs = [per_host_fn(g.iloc[s:e]) for s, e in zip(starts, ends)]
    outs = [o for o in outs if len(o)]
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()


def _entries_partition(g: pd.DataFrame) -> pd.DataFrame:
    return _apply_per_host(entries_host_group, g)


def _daily_partition(g: pd.DataFrame) -> pd.DataFrame:
    return _apply_per_host(daily_host_group, g)


def entries_table(labeled: rd.Dataset) -> rd.Dataset:
    cols = ["host", "warc_ts", "lat", "lon", "binning", "cid"]
    return (_add_part_key(labeled, cols)
            .groupby("part_key")
            .map_groups(_entries_partition, batch_format="pandas"))


def daily_features(labeled: rd.Dataset) -> rd.Dataset:
    cols = ["host", "warc_ts", "lat", "lon", "binning", "cid",
            "time_delta", "displacement"]
    return (_add_part_key(labeled, cols)
            .groupby("part_key")
            .map_groups(_daily_partition, batch_format="pandas"))


def cluster_table(labeled: rd.Dataset) -> rd.Dataset:
    """Engine-convention cluster table: per (host, cid != xNot) centroid of
    final members (5 dp) + member count. (The reference's home/work rows keep
    the pre-fence DBSCAN centroid — gps.py:1050-1065; the engine standardizes
    on final-membership centroids, documented deviation.)"""
    from ray.data.aggregate import Count, Mean

    agg = (labeled.select_columns(["host", "cid", "lat", "lon"])
           .groupby(["host", "cid"])
           .aggregate(Mean("lat", alias_name="lat"), Mean("lon", alias_name="lon"),
                      Count(alias_name="n_points")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t["cid"], "xNot"))
        cid = t["cid"].to_numpy(zero_copy_only=False)
        name = np.where(np.isin(cid, ["home", "work"]), cid, "nap")
        t = t.set_column(t.schema.get_field_index("lat"), "lat",
                         pa.array(np.round(t["lat"].to_numpy(), 5)))
        t = t.set_column(t.schema.get_field_index("lon"), "lon",
                         pa.array(np.round(t["lon"].to_numpy(), 5)))
        return (t.append_column("name", pa.array(name, pa.string()))
                .append_column("categories", pa.array(name, pa.string())))

    return agg.map_batches(finish, batch_format="pyarrow")
