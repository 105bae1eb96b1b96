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
            # deterministic per-batch sub-bucket: the key's own hash plus a
            # batch-content fingerprint, so a HOT key's partials land on a
            # different reducer per batch (position-based salting gave the
            # dominant key the SAME salt in every uniform-sized batch —
            # identical skew to salt=0 plus an extra stage)
            kh = pd.util.hash_array(np.asarray(keys)).astype(np.uint64)
            bfp = np.uint64((int(kh.sum()) + int(counts.sum()))
                            & 0xFFFFFFFFFFFFFFFF)
            s = ((kh + bfp) % np.uint64(salt)).astype(np.int32)
            out["salt"] = pa.array(s, pa.int32())
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
    """Top-k keys by row count (two-phase aggregate -> per-block top-k
    fold -> sort -> limit), deterministic tiebreak on the key.

    The aggregate emits each key exactly once, so folding every block to
    its local top-k under the SAME (n desc, key asc) total order is an
    exact superset of the global top-k — the final all-to-all sorts
    <= k x n_blocks rows instead of the whole distinct-key set."""
    agg = partial_count(ds, key_col, salt=salt, combine_blocks=combine_blocks)

    def local_top(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["n", key_col], ascending=[False, True]).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    return (agg.map_batches(local_top, batch_format="pyarrow")
            .sort(["n", key_col], descending=[True, False])
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
        if outs:
            return pd.concat(outs, ignore_index=True)
        # no bucket matched this batch: emit an empty frame with the JOINED
        # schema (columns + dtypes) — a bare pd.DataFrame() block breaks
        # downstream schema unification
        left_empty = df.drop(columns="_b").iloc[0:0]
        if rb:
            return left_empty.merge(next(iter(rb.values())).iloc[0:0],
                                    on=key_col, how="inner")
        return left_empty

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
            # content hash over EVERY bad row (first-row-only hashing let two
            # different batches starting with the same malformed record
            # collide and silently overwrite each other's quarantine file)
            rows = np.array([str(r) for r in bad.to_pylist()], dtype=object)
            key = int(np.bitwise_xor.reduce(hash64(rows))) ^ bad.num_rows
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


def _star_round(edges: rd.Dataset, large: bool, parts: int) -> rd.Dataset:
    """One large-star or small-star contraction round over an (u, v) edge set.

    Large-star: every node links its strictly-larger neighbors to the
    minimum of its neighborhood (incl. itself).  Small-star: with edges
    oriented (larger, smaller), every node links its smaller neighbors and
    itself to the minimum neighbor.  Alternating the two converges to
    per-component stars rooted at the component-minimum node in O(log n)
    rounds (Kiveris et al., "Connected Components in MapReduce and Beyond",
    ACM SoCC 2014 — public algorithm, re-expressed as Ray Data
    map_batches + groupby; only the edge set is shuffled each round).
    """

    def prep(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        if large:
            uu = np.concatenate([u, v])
            vv = np.concatenate([v, u])
        else:
            uu = np.maximum(u, v)
            vv = np.minimum(u, v)
        return pa.table({"u": pa.array(uu, pa.int64()),
                         "v": pa.array(vv, pa.int64()),
                         "part": pa.array((uu % parts).astype(np.int32),
                                          pa.int32())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].values
        v = g["v"].values
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(us)) + 1])
        seg_len = np.diff(np.append(starts, us.shape[0]))
        useg = us[starts]
        minv = vs[starts]          # vs ascending within each segment
        if large:
            m_rep = np.repeat(np.minimum(useg, minv), seg_len)
            mask = vs > us
            out_u, out_v = vs[mask], m_rep[mask]
        else:
            m_rep = np.repeat(minv, seg_len)   # all vs < us after orient
            mask = vs != m_rep
            out_u = np.concatenate([vs[mask], useg])
            out_v = np.concatenate([m_rep[mask], minv])
        if out_u.size == 0:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        z = np.empty(out_u.size, dtype=[("u", np.int64), ("v", np.int64)])
        z["u"] = out_u
        z["v"] = out_v
        z = np.unique(z)
        return pd.DataFrame({"u": z["u"], "v": z["v"]})

    return (edges.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(fold, batch_format="pandas"))


def _edge_signature(edges: rd.Dataset) -> tuple[int, int, int]:
    """(row count, two independent order-independent checksums) of an edge
    Dataset.  Two checksums with unrelated multipliers make a coincidental
    fixpoint collision (~2^-128 per round) practically impossible (ADVICE
    r3: a single-checksum collision would silently stop iteration early)."""

    def h(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        with np.errstate(over="ignore"):
            s = int((u * np.int64(1315423911)
                     ^ v * np.int64(-0x61C8864680B583EB)).sum())
            m = np.int64(0x100000001B3)
            s2 = int(((u ^ np.int64(0xCBF29CE484222325 - (1 << 64))) * m
                      + (v + np.int64(0x9E3779B9)) * (m * m)).sum())
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([s], pa.int64()),
                         "s2": pa.array([s2], pa.int64())})

    # fold the one-row-per-block partials on the driver with explicit
    # int64 wraparound: Ray's Sum reduce accumulates unbounded Python
    # ints, overflows the Arrow int64 column and silently falls back to a
    # pickled-object block
    rows = edges.map_batches(h, batch_format="pyarrow").take_all()
    n = int(sum(r["n"] for r in rows))
    with np.errstate(over="ignore"):
        s = int(np.array([r["s"] for r in rows], dtype=np.int64).sum())
        s2 = int(np.array([r["s2"] for r in rows], dtype=np.int64).sum())
    return (n, s, s2)


def _cc_single_task(t: pa.Table) -> pa.Table:
    """Whole-edge-set connected components in ONE worker task: vectorized
    min-label propagation with pointer-jumping (lab = lab[lab]) — O(E) per
    sweep, O(log n) sweeps. Used below when the edge set is small enough
    for one task; the driver only relays the result blocks."""
    u = t["u"].to_numpy().astype(np.int64)
    v = t["v"].to_numpy().astype(np.int64)
    # self-loops carry no connectivity and the star-contraction path drops
    # them structurally (large-star keeps strictly-larger neighbors only);
    # drop them here too so the two paths cover the SAME node set
    keep = u != v
    u, v = u[keep], v[keep]
    if u.size == 0:
        return pa.table({"id": pa.array([], pa.int64()),
                         "rep": pa.array([], pa.int64())})
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:u.size], inv[u.size:]
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        old = lab.copy()
        m = np.minimum(lab[ui], lab[vi])
        np.minimum.at(lab, ui, m)
        np.minimum.at(lab, vi, m)
        lab = lab[lab]  # pointer jumping halves chain depth per sweep
        if np.array_equal(lab, old):
            break
    return pa.table({"id": pa.array(nodes, pa.int64()),
                     "rep": pa.array(nodes[lab], pa.int64())})


def connected_components(edges: rd.Dataset, parts: int = 64,
                         max_rounds: int = 64,
                         small_edges: int = 4_000_000) -> rd.Dataset:
    """Distributed connected components over an undirected (u, v) edge set.

    Returns an (id, rep) Dataset covering every node that appears in a
    NON-self edge (u == v rows carry no connectivity and are ignored on
    both paths — a node with only self-loops is not covered), with
    ``rep`` = the minimum node id of its component.  Alternates
    large-star/small-star contraction (see :func:`_star_round`) until the
    canonical star edge set reaches a fixpoint (count + order-independent
    checksum unchanged).  Each round shuffles only the current edge set —
    the verified near-duplicate pair list, which is tiny relative to the
    corpus — and the iteration state is materialized per round so the
    lazy lineage does not re-execute compounding rounds.

    Edge sets at or below ``small_edges`` rows (the overwhelmingly common
    case: dedup pair lists and DBSCAN merge edges are O(duplicates) /
    O(cross-cell merges), not O(rows)) skip the iterative contraction and
    contract in ONE worker task (:func:`_cc_single_task`): same result,
    none of the per-round shuffle latency (measured ~6 s of fixed
    overhead on a metadata-sized edge set at 32 CPUs). Pass
    ``small_edges=0`` to force the star-contraction path."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "rep": pa.array([], pa.int64())}))
    if n_edges <= small_edges:
        return edges.repartition(1).map_batches(
            _cc_single_task, batch_format="pyarrow", batch_size=None)
    prev = None
    converged = False
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True, parts=parts).materialize()
        edges = _star_round(edges, large=False, parts=parts).materialize()
        sig = _edge_signature(edges)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            f"(last signature {prev}); raise max_rounds — star contraction "
            "needs O(log n) rounds, so this indicates a bug or bad input")
    # Converged: edges are (node, root) stars.  Emit them as (id, rep) and
    # add one (root, root) row per distinct root (distributed dedup).
    members = edges.map_batches(
        lambda t: pa.table({"id": t["u"].cast(pa.int64()),
                            "rep": t["v"].cast(pa.int64())}),
        batch_format="pyarrow")
    roots = (edges.groupby("v").count()
             .map_batches(lambda t: pa.table({"id": t["v"].cast(pa.int64()),
                                              "rep": t["v"].cast(pa.int64())}),
                          batch_format="pyarrow"))
    return members.union(roots)
