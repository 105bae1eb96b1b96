"""Similarity search over embedding columns: brute-force cosine top-k
(baseline, exact) and LSH-bucketed / IVF-style variants (scale path).

Vectorized numpy; used inside map_batches with the query matrix broadcast
via ray.put (the corpus streams, the queries are the small side).
"""

from __future__ import annotations

import numpy as np


def normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, corpus_ids: np.ndarray,
                k: int = 10, chunk: int = 8192):
    """Exact cosine top-k of each query against the corpus.

    Returns (ids[nq, k], scores[nq, k]) sorted by (-score, id) — the id
    tiebreak keeps results deterministic and SQL-matchable
    (ORDER BY score DESC, id)."""
    q = normalize(queries)
    nq = q.shape[0]
    best_scores = np.full((nq, 0), 0.0)
    best_ids = np.full((nq, 0), 0, dtype=np.int64)
    for off in range(0, corpus.shape[0], chunk):
        c = normalize(corpus[off:off + chunk])
        ids = np.asarray(corpus_ids[off:off + chunk], dtype=np.int64)
        s = q @ c.T
        all_s = np.concatenate([best_scores, s], axis=1)
        all_i = np.concatenate([best_ids, np.tile(ids, (nq, 1))], axis=1)
        kk = min(k, all_s.shape[1])
        part = np.argpartition(-all_s, kk - 1, axis=1)[:, :kk]
        best_scores = np.take_along_axis(all_s, part, axis=1)
        best_ids = np.take_along_axis(all_i, part, axis=1)
    order = np.lexsort((best_ids, -best_scores), axis=1)
    return (np.take_along_axis(best_ids, order, axis=1),
            np.take_along_axis(best_scores, order, axis=1))


def cosine_pairs_above(emb: np.ndarray, ids: np.ndarray, threshold: float,
                       chunk: int = 4096):
    """All pairs (i < j by id) with cosine similarity > threshold — exact,
    blocked matmul. Returns (id_a, id_b, score) arrays sorted by (id_a, id_b).
    Embedding near-dup detection baseline."""
    e = normalize(emb)
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    e, ids = e[order], ids[order]
    n = e.shape[0]
    out_a, out_b, out_s = [], [], []
    for i0 in range(0, n, chunk):
        a = e[i0:i0 + chunk]
        for j0 in range(i0, n, chunk):
            b = e[j0:j0 + chunk]
            s = a @ b.T
            if i0 == j0:
                iu = np.triu_indices(s.shape[0], k=1)
                m = s[iu] > threshold
                out_a.append(ids[i0 + iu[0][m]])
                out_b.append(ids[j0 + iu[1][m]])
                out_s.append(s[iu][m])
            else:
                ii, jj = np.where(s > threshold)
                out_a.append(ids[i0 + ii])
                out_b.append(ids[j0 + jj])
                out_s.append(s[ii, jj])
    if not out_a:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    s = np.concatenate(out_s)
    o = np.lexsort((b, a))
    return a[o], b[o], s[o]


def hyperplane_lsh_codes(emb: np.ndarray, n_bits: int = 16, seed: int = 11) -> np.ndarray:
    """Random-hyperplane LSH bucket codes (uint64). Near-duplicate vectors
    land in the same bucket with high probability; used to prefilter the
    pair search at scale (candidates = same bucket, verify with exact
    cosine)."""
    rng = np.random.default_rng(seed)
    e = normalize(emb)
    planes = rng.standard_normal((e.shape[1], n_bits))
    bits = (e @ planes) > 0
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(np.uint64)


def rademacher_signs(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """(dim, n_bits) +/-1 hyperplane matrix from integer-hash bits —
    SQL-replicable (multiply-mix then middle bit), standard sign-random-
    projection LSH with Rademacher entries."""
    d = np.arange(dim, dtype=np.int64)[:, None]
    b = np.arange(n_bits, dtype=np.int64)[None, :]
    # mod-reduce between the multiplies keeps every product within int64
    # (overflow-free => identical in BIGINT SQL; no silent numpy wraparound)
    h1 = (d * 2654435761 + b * 40503 + int(seed) * 97) % (1 << 31)
    h = (h1 * 2654435761) % (1 << 31)
    return np.where((h >> 15) & 1 == 1, 1.0, -1.0)


def rademacher_codes(emb: np.ndarray, n_bits: int, seed: int) -> np.ndarray:
    """uint64 bucket codes: sign bits of emb @ rademacher_signs (raw
    embeddings — signs are scale-invariant, so no normalization and no
    normalization-order float divergence vs the SQL oracle).

    The embedding is quantized to the 2^-12 dyadic grid first (ADVICE r2
    #5): every +/-1 product is then an exact multiple of 2^-12 and the
    64-term projection sum is exactly representable in float64, so BLAS
    pairwise/FMA ordering and SQL's sequential list_sum produce the SAME
    double — the sign bit cannot straddle 0 differently on the two
    sides."""
    e = np.asarray(emb, dtype=np.float64)
    e = np.rint(e * 4096.0) / 4096.0
    s = rademacher_signs(e.shape[1], n_bits, seed)
    bits = (e @ s) > 0
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(np.uint64)


def ivf_assign(emb: np.ndarray, n_cells: int = 16, iters: int = 5, seed: int = 13):
    """Tiny deterministic k-means (IVF coarse quantizer). Returns
    (assignments, centroids). Scale path: search only the closest cells."""
    rng = np.random.default_rng(seed)
    e = normalize(emb)
    if e.shape[0] == 0:
        # empty batches reach kernels after filters; argmax over a
        # zero-width axis would raise
        return (np.empty(0, dtype=np.int64),
                np.empty((0, emb.shape[1] if emb.ndim == 2 else 0)))
    n_cells = min(n_cells, e.shape[0])
    cent = e[rng.choice(e.shape[0], n_cells, replace=False)]
    for _ in range(iters):
        sim = e @ cent.T
        assign = np.argmax(sim, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cent[c] = e[m].mean(axis=0)
        cent = normalize(cent)
    return np.argmax(e @ cent.T, axis=1), cent
