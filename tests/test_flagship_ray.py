"""Ray-level pipeline tests: flagship labeling, byte-identity invariant,
path equivalence (pandas vs fused-arrow), and checkpoint/resume."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

N_PAGES = 4000
N_HOSTS = 6


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    from gscap_ray.synth import ensure_pages

    d = tmp_path_factory.mktemp("pages")
    return ensure_pages(str(d / "pages"), N_PAGES, n_hosts=N_HOSTS, days=6, seed=11)


@pytest.fixture(scope="module")
def labeled_df(pages_dir):
    from gscap_ray.pipelines.flagship import labeled_pages
    from gscap_ray.synth import generate_polygon_layer

    polys = generate_polygon_layer(n_hosts=N_HOSTS, seed=11, extra=5)
    return labeled_pages(pages_dir, polygons=polys).to_pandas()


def test_labeled_conservation_and_labels(labeled_df):
    assert len(labeled_df) == N_PAGES
    cids = set(labeled_df["cid"])
    assert "home" in cids and "work" in cids
    # PIP enrichment labeled home points as residential
    home = labeled_df[labeled_df["cid"] == "home"]
    assert (home["place_category"] == "residential").mean() > 0.9


def test_text_byte_identity(pages_dir, labeled_df):
    import pyarrow.parquet as pq

    src = pq.read_table(pages_dir, columns=["url", "text"]).to_pandas()
    out = labeled_df[["url", "text"]]
    merged = src.merge(out, on="url", suffixes=("_in", "_out"))
    assert len(merged) == N_PAGES
    assert (merged["text_in"] == merged["text_out"]).all()


def test_fused_arrow_equals_pandas_path(pages_dir, labeled_df):
    """daily_features(labeled) (pandas per-host path) and
    daily_features_direct (arrow fused path) must produce identical feature
    values per (host, date)."""
    from gscap_ray.pipelines.flagship import daily_features, daily_features_direct
    from gscap_ray.pipelines import flagship as F
    import ray.data as rd

    a = daily_features(rd.from_pandas(labeled_df)).to_pandas()
    b = daily_features_direct(pages_dir).to_pandas()
    from gscap_ray.synth import hash64

    a["host_hash"] = hash64(a["host"].values).view(np.int64)
    a = a.drop(columns=["host"]).sort_values(["host_hash", "date"]).reset_index(drop=True)
    b = b.sort_values(["host_hash", "date"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_checkpoint_resume(pages_dir, tmp_path):
    from gscap_ray.pipelines.flagship import run_checkpointed
    from gscap_ray.state.checkpoint import read_output

    out = str(tmp_path / "ckpt")
    s1 = run_checkpointed(pages_dir, out, input_fingerprint="fp1")
    assert s1["written"] > 0 and s1["skipped_at_read"] == 0
    rows1 = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(rows1) == N_PAGES

    # rerun: everything skips at read
    s2 = run_checkpointed(pages_dir, out, input_fingerprint="fp1")
    assert s2["skipped_at_read"] == s1["written"]
    assert s2["written"] == 0

    # kill one partition -> only it is recomputed, output identical
    parts = [p for p in os.listdir(out) if p.startswith("part_key=")]
    shutil.rmtree(os.path.join(out, parts[0]))
    s3 = run_checkpointed(pages_dir, out, input_fingerprint="fp1")
    assert s3["written"] == 1
    rows2 = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(rows1, rows2)

    # manifest carries lineage + metrics
    with open(os.path.join(out, parts[0], "manifest.json")) as f:
        m = json.load(f)
    assert m["input_fingerprint"] == "fp1"
    assert m["rows"] > 0 and m["text_xor_hash"] is not None
    assert "cid_counts" in m["metrics"] and sum(m["metrics"]["cid_counts"].values()) == m["rows"]

    # input change (new fingerprint) -> full recompute
    s4 = run_checkpointed(pages_dir, out, input_fingerprint="fp2")
    assert s4["written"] == s1["written"] and s4["skipped_at_read"] == 0


def test_checkpoint_fusion_equals_labeled_pages(pages_dir, labeled_df, tmp_path):
    """The fused sink (labeling via the write task's transform hook, one
    exchange) must write exactly what labeled_pages computes — column for
    column, text bytes included."""
    from gscap_ray.pipelines.flagship import run_checkpointed
    from gscap_ray.state.checkpoint import read_output
    from gscap_ray.synth import generate_polygon_layer

    polys = generate_polygon_layer(n_hosts=N_HOSTS, seed=11, extra=5)
    out = str(tmp_path / "fused")
    run_checkpointed(pages_dir, out, input_fingerprint="fpF", polygons=polys)
    a = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    b = labeled_df.sort_values("url").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    for c in sorted(a.columns):
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert pd.Series(av).equals(pd.Series(bv)), c


def test_checkpoint_orphan_staging_dirs(ray_session, tmp_path):
    """A write task killed between manifest write and the atomic rename
    leaves 'part_key=N.tmp' behind. It must neither crash the resume scan
    nor count as done, and read_output must skip it (plus any dir without
    a readable manifest, and — with a fingerprint — stale partitions from
    a different input)."""
    from gscap_ray.state.checkpoint import (
        completed_partitions,
        read_output,
        write_partition,
    )

    out = str(tmp_path / "ck")
    os.makedirs(out)
    df = pd.DataFrame({"part_key": [3, 3], "v": [1, 2]})
    write_partition(df, out, 3, "fpA", partitions=128)
    write_partition(pd.DataFrame({"part_key": [9], "v": [7]}),
                    out, 9, "fpOLD", partitions=128)

    # simulate the crash window: staging dir with manifest + data inside
    orphan = os.path.join(out, "part_key=5.tmp")
    os.makedirs(orphan)
    df.to_parquet(os.path.join(orphan, "data.parquet"), index=False)
    with open(os.path.join(orphan, "manifest.json"), "w") as f:
        json.dump({"part_key": 5, "input_fingerprint": "fpA",
                   "layout": {"partitions": 128,
                              "scheme": "murmur-host-v1"}, "rows": 2}, f)
    # and a committed-looking dir with no manifest at all
    os.makedirs(os.path.join(out, "part_key=6"))

    assert completed_partitions(out, "fpA", 128) == {3}
    assert read_output(out).count() == 3            # 3 + stale 9, no orphan
    assert read_output(out, input_fingerprint="fpA").count() == 2


def test_checkpoint_layout_binding(tmp_path):
    """ADVICE r2 (medium): a manifest written under a different partition
    layout (count or hash-scheme version) must NOT validate — resuming
    across a layout change would silently drop rows whose new part_key
    collides with an old directory."""
    import pandas as pd

    from gscap_ray.state.checkpoint import (
        LAYOUT_SCHEME,
        completed_partitions,
        run_is_complete,
        write_partition,
    )

    out = str(tmp_path / "ck")
    os.makedirs(out)
    df = pd.DataFrame({"part_key": [3, 3], "v": [1, 2]})
    write_partition(df, out, 3, "fpX", partitions=128)

    # same layout -> valid; different count -> invalid; unknown -> lenient
    assert completed_partitions(out, "fpX", 128) == {3}
    assert completed_partitions(out, "fpX", 256) == set()
    assert completed_partitions(out, "fpX") == {3}

    # legacy manifest without a layout stamp never validates against a
    # layout-aware resume
    with open(os.path.join(out, "part_key=3", "manifest.json")) as f:
        m = json.load(f)
    m.pop("layout")
    with open(os.path.join(out, "part_key=3", "manifest.json"), "w") as f:
        json.dump(m, f)
    assert completed_partitions(out, "fpX", 128) == set()

    # _COMPLETE.json is layout-bound the same way
    from gscap_ray.state.checkpoint import mark_run_complete

    mark_run_complete(out, "fpX", {3}, partitions=128)
    assert run_is_complete(out, "fpX", {3}, 128)
    assert not run_is_complete(out, "fpX", {3}, 256)
    assert LAYOUT_SCHEME.startswith("murmur-host")


def test_write_tiled(pages_dir, tmp_path):
    import os

    import pyarrow.parquet as pq

    from gscap_ray.pipelines.flagship import geocoded_pages
    from gscap_ray.state.checkpoint import write_tiled

    out = str(tmp_path / "tiled")
    n_dirs = write_tiled(geocoded_pages(pages_dir), out, s2_level=4)
    assert n_dirs >= 2  # hosts are spread over the globe
    # all rows present, every file within a dir shares the coarse tile
    total = 0
    for d in os.listdir(out):
        assert d.startswith("s2_tile=")
        t = pq.read_table(os.path.join(out, d))
        total += t.num_rows
        from gscap_ray.functions.cells import s2_parent
        coarse = set(f"{v:016x}" for v in s2_parent(t["s2_cell"].to_numpy(), 4).tolist())
        assert coarse == {d.split("=", 1)[1]}
    assert total == N_PAGES


def test_label_partition_equals_per_host_path(ray_session):
    """The Arrow part_key fast path produces exactly the per-host pandas
    path's labels (cid, binning, velocity features, distance_from_home) for
    every url — the round-2 rewrite is a pure execution change."""
    import numpy as np
    import pandas as pd

    from gscap_ray.pipelines.flagship import label_host_group, labeled_pages
    from gscap_ray.stages.geocode import geocode_batch
    from gscap_ray.synth import ensure_pages, generate_pages_table

    pages_dir = ensure_pages("/tmp/gscap_eqtest_pages", 4000, n_hosts=6,
                             days=4, seed=11)
    new = labeled_pages(pages_dir).to_pandas().sort_values("url").reset_index(drop=True)

    # reference path: per-host pandas labeling over the same geocoded rows
    import pyarrow as pa

    t = generate_pages_table(4000, n_hosts=6, days=4, seed=11)
    g = geocode_batch(t).to_pandas()
    outs = [label_host_group(grp) for _h, grp in g.groupby("host", sort=False)]
    old = pd.concat(outs, ignore_index=True).sort_values("url").reset_index(drop=True)

    assert list(new["url"]) == list(old["url"])
    for col in ("cid", "binning"):
        assert (new[col].values == old[col].values).all(), col
    for col in ("displacement", "time_delta", "velocity", "distance_from_home"):
        a, b = new[col].values, old[col].values
        assert np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True), col
    # byte identity of text through the new path
    assert (new["text"].values == old["text"].values).all()


def test_read_blocks_for_sizing():
    """Block sizing: ~250k rows/block, floored at cluster CPUs (one map wave
    fills every core), capped so the exchange object count stays bounded."""
    import ray

    from gscap_ray.stages.geocode import read_blocks_for

    ncpus = int(ray.cluster_resources()["CPU"])
    assert read_blocks_for(None) is None
    assert read_blocks_for(0) is None
    # tiny input: floored at the CPU count, never zero
    assert read_blocks_for(10_000) == max(ncpus, 1)
    # bench shape: 8M rows -> max(ncpus, 32) blocks
    assert read_blocks_for(8_000_000) == max(ncpus, 32)
    # huge input: capped (sub-object count must stay bounded)
    assert read_blocks_for(10**12) <= 4096
