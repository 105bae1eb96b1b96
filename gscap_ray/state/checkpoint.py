"""Per-partition checkpoint manifests for resumable runs.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference's resume mechanism is its sqlite cache
(hits vs misses, gps.py:598-624); the engine's is partition-level:

- output is laid out as one directory per partition key
  (``out/part_key=K/``), written atomically (tmp dir + rename);
- each partition directory carries ``manifest.json`` with the input
  fingerprint, row count, text-hash checksum (byte-identity lineage),
  timings and custom metrics;
- on resume, partitions whose manifest matches the current input
  fingerprint are skipped (their rows are not recomputed).

The partition column is ``part_key`` = hash(host) % P (stages/geocode.py),
so every host's stream lives in exactly one partition — skew-bounded by the
hot-host salting at a finer stage, while resume stays host-atomic.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd


# Hash-scheme version stamped into every manifest. Bump whenever the
# host -> part_key mapping changes (hash function, salt, key column):
# a manifest from another scheme must never validate, or resume will
# silently drop rows whose new part_key collides with an old directory
# (ADVICE r2, medium).
LAYOUT_SCHEME = "murmur-host-v1"


def _layout(partitions: int | None) -> dict | None:
    return None if partitions is None else {
        "partitions": int(partitions), "scheme": LAYOUT_SCHEME}


def partition_fingerprint(part_key: int, input_fingerprint: str) -> str:
    return f"{input_fingerprint}:{part_key}"


def load_manifest(part_dir: str) -> dict | None:
    p = os.path.join(part_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def completed_partitions(out_dir: str, input_fingerprint: str,
                         partitions: int | None = None) -> set[int]:
    """Partition keys whose manifest validates against the input AND the
    current partition layout. A manifest written under a different
    partition count (partitions_for can change with target_rows) or hash
    scheme is treated as NOT done — its part_key numbers a different row
    set, so skipping it would lose rows on cross-version resume."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    want_layout = _layout(partitions)
    for name in os.listdir(out_dir):
        if not name.startswith("part_key="):
            continue
        # a crashed write can orphan 'part_key=N.tmp' (manifest written
        # into the staging dir before the atomic rename) — never a
        # completed partition, and int('N.tmp') would poison resume
        if not name.split("=", 1)[1].isdigit():
            continue
        m = load_manifest(os.path.join(out_dir, name))
        if not m or m.get("input_fingerprint") != input_fingerprint:
            continue
        if want_layout is not None and m.get("layout") != want_layout:
            continue
        done.add(int(name.split("=", 1)[1]))
    return done


def write_partition(df, out_dir: str, part_key: int,
                    input_fingerprint: str, metrics: dict | None = None,
                    partitions: int | None = None) -> dict:
    """Atomically write one partition + manifest; returns the manifest.

    Accepts a pandas DataFrame or a pyarrow Table. The Arrow path writes
    the table directly (no object-string materialization of ``text`` —
    the Arrow->pandas->Arrow round trip was most of the write stage's CPU
    at 8M rows); the text checksum is computed over the same Python
    string values either way, so manifests stay cross-path comparable."""
    import pyarrow as pa

    from ..synth import hash64

    final = os.path.join(out_dir, f"part_key={part_key}")
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.time()
    text_checksum = None
    if isinstance(df, pa.Table):
        import pyarrow.parquet as pq

        pq.write_table(df, os.path.join(tmp, "data.parquet"))
        nrows = df.num_rows
        if "text" in df.column_names:
            text_checksum = int(np.bitwise_xor.reduce(
                hash64(df["text"].to_numpy(zero_copy_only=False)))) if nrows else 0
    else:
        df.to_parquet(os.path.join(tmp, "data.parquet"), index=False)
        nrows = len(df)
        if "text" in df.columns:
            text_checksum = int(np.bitwise_xor.reduce(hash64(df["text"].values))) if nrows else 0
    manifest = {
        "part_key": int(part_key),
        "input_fingerprint": input_fingerprint,
        "layout": _layout(partitions),
        "rows": int(nrows),
        "text_xor_hash": text_checksum,
        "write_seconds": round(time.time() - t0, 3),
        "metrics": metrics or {},
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return manifest


def run_partitioned(labeled_ds, out_dir: str, input_fingerprint: str,
                    partitions: int | None = None, transform=None,
                    done: set[int] | None = None):
    """Consume a labeled Dataset, writing one checkpointed partition per
    part_key and skipping already-valid partitions. Returns summary dict.

    Uses ``map_groups`` on part_key so each partition is written by the task
    that holds its rows (no driver materialization).

    ``transform`` (Arrow table -> Arrow table), when given, runs on each
    partition INSIDE the write task, fusing the per-partition compute with
    the sink: the caller skips its own ``groupby(part_key)`` and the
    partition's rows cross the exchange exactly once (the label -> write
    double shuffle was ~4s of the checkpoint_write bench row at sf0.1;
    VERDICT r4 #7).

    ``done``, when given, is the caller's already-computed
    completed-partition set (run_checkpointed scans it anyway to filter
    the read) — passing it skips a second O(partitions) manifest scan."""
    if done is None:
        done = completed_partitions(out_dir, input_fingerprint, partitions)
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g):
        import pyarrow as pa
        import pyarrow.compute as pc

        pk = int(g["part_key"][0].as_py())
        if pk in done:
            return pa.table({"part_key": pa.array([pk], pa.int64()),
                             "rows": pa.array([0], pa.int64()),
                             "skipped": pa.array([True])})
        if transform is not None:
            g = transform(g)
        # per-partition metrics (A6 hits/misses analog): enrichment hit
        # ratios and label distribution, recorded in the manifest
        metrics = {}
        if "place_id" in g.column_names:
            hits = int(g.num_rows - g["place_id"].null_count)
            metrics["pip_hits"] = hits
            metrics["pip_misses"] = int(g.num_rows - hits)
        if "cid" in g.column_names:
            vc = pc.value_counts(g["cid"].combine_chunks())
            metrics["cid_counts"] = {
                str(v): int(c) for v, c in
                zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())}
        m = write_partition(g, out_dir, pk, input_fingerprint,
                            metrics=metrics, partitions=partitions)
        return pa.table({"part_key": pa.array([pk], pa.int64()),
                         "rows": pa.array([int(m["rows"])], pa.int64()),
                         "skipped": pa.array([False])})

    res = (labeled_ds.groupby("part_key")
           .map_groups(write_group, batch_format="pyarrow")).to_pandas()
    # the dataset drained fully -> every input row is now under a valid
    # manifest; record the full partition-key set so later resumes can
    # short-circuit by re-validating manifests only (works even when some
    # part_keys are empty and the dir count never reaches the nominal
    # partition count; deleting/corrupting a partition invalidates it)
    all_keys = done | set(int(k) for k in res["part_key"]) if len(res) else done
    mark_run_complete(out_dir, input_fingerprint, all_keys, partitions)
    if len(res) == 0:  # everything was filtered out at the read (full resume)
        return {"partitions": 0, "written": 0, "skipped": 0, "rows_written": 0}
    return {
        "partitions": int(len(res)),
        "written": int((~res["skipped"]).sum()),
        "skipped": int(res["skipped"].sum()),
        "rows_written": int(res["rows"].sum()),
    }


def mark_run_complete(out_dir: str, input_fingerprint: str,
                      part_keys: set[int],
                      partitions: int | None = None) -> None:
    with open(os.path.join(out_dir, "_COMPLETE.json"), "w") as f:
        json.dump({"input_fingerprint": input_fingerprint,
                   "layout": _layout(partitions),
                   "part_keys": sorted(int(k) for k in part_keys),
                   "completed_at": time.time()}, f)


def run_is_complete(out_dir: str, input_fingerprint: str,
                    done: set[int], partitions: int | None = None) -> bool:
    """True iff a prior run for this input drained fully under the SAME
    partition layout AND every partition it wrote still carries a valid
    manifest (``done``)."""
    p = os.path.join(out_dir, "_COMPLETE.json")
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    want_layout = _layout(partitions)
    if want_layout is not None and m.get("layout") != want_layout:
        return False
    return (m.get("input_fingerprint") == input_fingerprint
            and set(m.get("part_keys", [])) <= done)


def filter_out_partitions(ds, done: set[int]):
    """Drop rows of already-completed partitions right after geocode/tile,
    BEFORE the expensive shuffle + clustering — this is what makes resume
    actually cheap (completed partitions never enter the wide stages)."""
    if not done:
        return ds
    import pyarrow as pa
    import pyarrow.compute as pc

    done_arr = pa.array(sorted(done), pa.uint32())

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t["part_key"], value_set=done_arr)))

    return ds.map_batches(f, batch_format="pyarrow")


def read_output(out_dir: str, columns=None, input_fingerprint: str | None = None):
    """Read back all completed partitions as one Dataset.

    Only directories with a committed name (no ``.tmp`` staging orphans
    from a crashed write) AND a readable manifest are included — a
    truncated orphan parquet or a half-written partition never reaches
    the reader. Pass ``input_fingerprint`` to additionally exclude stale
    partitions left in a reused out_dir by a DIFFERENT input (their
    manifests carry the old fingerprint)."""
    import ray.data as rd

    parts = []
    for n in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if not n.startswith("part_key=") or not n.split("=", 1)[1].isdigit():
            continue
        m = load_manifest(os.path.join(out_dir, n))
        if m is None:
            continue
        if (input_fingerprint is not None
                and m.get("input_fingerprint") != input_fingerprint):
            continue
        parts.append(os.path.join(out_dir, n, "data.parquet"))
    if not parts:
        # fresh/crashed run or all partitions stale: an empty dataset, not
        # a read_parquet([]) ValueError / missing-dir FileNotFoundError
        import pyarrow as pa

        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(parts, columns=columns)


def write_tiled(ds, out_dir: str, s2_level: int = 4):
    """Spatially partitioned sink (SURVEY.md §7 step 2): hive layout keyed by
    the coarse S2 ancestor of each row's ``s2_cell`` — readers prune by
    region the way the resume path prunes by part_key. Bounded directory
    count (<= 6 * 4^level).

    Returns the number of distinct tile directories written."""
    import numpy as np
    import pyarrow as pa

    from ..functions.cells import s2_parent

    def add_tile(t: pa.Table) -> pa.Table:
        coarse = s2_parent(t["s2_cell"].to_numpy(), s2_level)
        # hex string key -> readable, lexicographically stable dir names
        keys = np.array([f"{v:016x}" for v in coarse.tolist()], dtype=object)
        return t.append_column("s2_tile", pa.array(keys, pa.string()))

    ds.map_batches(add_tile, batch_format="pyarrow", batch_size=None) \
        .write_parquet(out_dir, partition_cols=["s2_tile"])
    import os

    return sum(1 for n in os.listdir(out_dir) if n.startswith("s2_tile="))
