"""Tests for ops utilities (two-phase salted aggregation, bucketed join)
and the CLI entrypoint."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def test_partial_count_matches_plain(ray_session):
    import ray.data as rd

    from gscap_ray.ops import partial_count, topk_by_count

    rng = np.random.default_rng(1)
    keys = rng.choice(["hot"] * 8 + ["a", "b", "c"], size=5000)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    plain = pd.Series(keys).value_counts()
    for salt in (0, 4):
        got = partial_count(ds, "k", salt=salt).to_pandas().set_index("k")["n"]
        assert got.sort_index().tolist() == plain.sort_index().tolist(), salt
    top = topk_by_count(ds, "k", 2, salt=4)
    assert top["k"].iloc[0] == "hot"


def test_bucketed_pairs_join(ray_session):
    import ray.data as rd

    from gscap_ray.ops import bucketed_pairs

    left = pd.DataFrame({"k": ["a", "b", "c", "a"], "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["a", "c", "d"], "w": [10, 30, 40]})
    out = bucketed_pairs(rd.from_pandas(left).repartition(2), right, "k",
                         n_buckets=4).to_pandas()
    want = left.merge(right, on="k")
    assert len(out) == len(want) == 3
    assert sorted(out["w"].tolist()) == sorted(want["w"].tolist())


@pytest.mark.parametrize("args", [["synth"]])
def test_cli_synth_and_run(tmp_path, args):
    pages = tmp_path / "pages"
    out = tmp_path / "out"
    r1 = subprocess.run(
        [sys.executable, "-m", "gscap_ray", "synth", "--out", str(pages),
         "--pages", "2000", "--hosts", "4", "--days", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-500:]
    assert json.loads(r1.stdout.strip().splitlines()[-1])["rows"] == 2000

    r2 = subprocess.run(
        [sys.executable, "-m", "gscap_ray", "run", "--pages", str(pages),
         "--out", str(out), "--fingerprint", "t1", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-800:]
    s = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s["written"] > 0

    # resumed run skips everything
    r3 = subprocess.run(
        [sys.executable, "-m", "gscap_ray", "run", "--pages", str(pages),
         "--out", str(out), "--fingerprint", "t1", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    s3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert s3["written"] == 0 and s3["skipped_at_read"] > 0


def test_quarantine_split(ray_session, tmp_path):
    import pyarrow.compute as pc
    import ray.data as rd

    from gscap_ray.ops import quarantine_split, quarantined_count

    df = pd.DataFrame({"x": np.arange(100), "y": np.arange(100) % 7})
    qdir = str(tmp_path / "quarantine")
    valid = quarantine_split(rd.from_pandas(df).repartition(4),
                             lambda t: pc.less(t["x"], 80), qdir)
    got = valid.to_pandas()
    assert len(got) == 80 and (got["x"] < 80).all()
    assert quarantined_count(qdir) == 20
    # idempotent rerun: same content-hash file names, no duplicates
    quarantine_split(rd.from_pandas(df).repartition(4),
                     lambda t: pc.less(t["x"], 80), qdir).to_pandas()
    assert quarantined_count(qdir) == 20


def test_random_sample_seeded(ray_session):
    """SRT4: ds.random_sample exercised with a fixed seed (the reference's
    np.random.choice sampling analog, notebooks/fill_place_api_cache)."""
    import ray.data as rd

    ds = rd.range(20000)
    n1 = ds.random_sample(0.1, seed=7).count()
    n2 = rd.range(20000).random_sample(0.1, seed=7).count()
    assert 1500 < n1 < 2500  # Bernoulli 10% of 20k
    assert n1 == n2  # seeded -> reproducible


def test_sampled_stats_matches_oracle(ray_session):
    import sys
    from pathlib import Path

    import duckdb

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from check_correctness import compare, to_pandas

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    r = to_pandas(QUERIES["sampled_stats"](sf))
    s = con.sql(ORACLE_SQL["sampled_stats"]).df()
    assert compare("sampled_stats", r, s) is None


def test_quarantine_distinct_batches_no_collision(ray_session, tmp_path):
    """Two batches whose bad sets START with the same malformed row must
    land in two files (first-row-only hashing collided and silently
    overwrote one of them)."""
    import ray.data as rd

    from gscap_ray.ops import quarantine_split, quarantined_count

    qdir = str(tmp_path / "q")
    shared = {"v": -1, "tag": "same-first-bad-row"}
    b1 = pd.DataFrame([shared, {"v": -2, "tag": "only-in-batch-1"},
                       {"v": 5, "tag": "ok"}])
    b2 = pd.DataFrame([shared, {"v": -3, "tag": "only-in-batch-2"},
                       {"v": 6, "tag": "ok"}])
    ds = rd.from_pandas([b1, b2])  # two blocks -> two split() calls

    def valid(t):
        import pyarrow.compute as pc

        return pc.greater_equal(t["v"], 0)

    n_ok = quarantine_split(ds, valid, qdir).count()
    assert n_ok == 2
    assert quarantined_count(qdir) == 4  # 2 + 2, no file overwritten


def test_bucketed_pairs_empty_batch_schema(ray_session):
    """A batch with zero bucket matches must emit an empty block with the
    JOINED schema, not a zero-column frame that breaks unification."""
    import ray.data as rd

    from gscap_ray.ops import bucketed_pairs

    left = rd.from_pandas([
        pd.DataFrame({"k": ["x", "y"], "l": [1, 2]}),     # no match at all
        pd.DataFrame({"k": ["a", "a"], "l": [3, 4]}),      # matches
    ])
    right = pd.DataFrame({"k": ["a", "b"], "r": [10, 20]})
    out = bucketed_pairs(left, right, "k").to_pandas()
    assert sorted(out.columns) == ["k", "l", "r"]
    assert len(out) == 2 and set(out["r"]) == {10}


def test_connected_components_self_loop_paths_agree(ray_session):
    """Self-loops are ignored identically on the single-task and
    star-contraction paths (they used to diverge: single-task emitted the
    node, star silently dropped it)."""
    import ray.data as rd

    from gscap_ray.ops import connected_components

    edges = pd.DataFrame({"u": [1, 2, 7], "v": [2, 3, 7]})  # 7 = self-loop
    ds = rd.from_pandas(edges)
    fast = (connected_components(ds).to_pandas()
            .sort_values("id").reset_index(drop=True))
    star = (connected_components(ds, small_edges=0).to_pandas()
            .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, star)
    assert set(fast["id"]) == {1, 2, 3}  # self-loop-only node not covered


def test_distributed_dbscan_rejects_sub_eps_cells(ray_session):
    import ray.data as rd

    from gscap_ray.pipelines.spatial import distributed_dbscan

    ds = rd.from_pandas(pd.DataFrame(
        {"point_id": [1, 2], "lon": [0.0, 0.001], "lat": [0.0, 0.001]}))
    with pytest.raises(ValueError, match="cell_factor"):
        distributed_dbscan(ds, eps=0.02, min_samples=2, cell_factor=0.5)
