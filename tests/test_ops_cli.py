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
