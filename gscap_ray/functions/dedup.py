"""Deduplication kernels: exact hash, k-shingle Jaccard, MinHash(+LSH bands),
SimHash.

Reference analog: the 5-dp coordinate rounding that collapses nearby cache
requests onto one cache line (/root/reference/gscap/gps.py:94-95,
SURVEY.md §2.7 D1-D3) — generalized to content-based near-dedup for web-scale
document tables. All kernels are deterministic (fixed hash key / seeds) and
mergeable: per-batch signatures explode to (band, bucket, doc) rows that a
groupby collects into candidate groups (the LSH shuffle pattern,
ray_guide 'Aggregation at scale').
"""

from __future__ import annotations

import numpy as np

from ..synth import hash64

_MERSENNE = (1 << 61) - 1


def exact_key(texts: np.ndarray) -> np.ndarray:
    """uint64 content hash for exact dedup (hash-partition + first-wins)."""
    return hash64(texts)


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of one document."""
    if len(tokens) < k:
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        return hash64(np.asarray([" ".join(tokens)], dtype=object))
    sh = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(hash64(np.asarray(sh, dtype=object)))


def window_hashes(tokens: list[str], k: int = 8) -> np.ndarray:
    """Distinct uint64 hashes of the k-token windows of one document
    (md5_number_lower of the space-joined window — bit-identical to the
    DuckDB twin). Empty when the doc has fewer than k tokens: substring
    dedup (Lee et al. 2022) only considers spans of at least k tokens."""
    if len(tokens) < k:
        return np.empty(0, dtype=np.uint64)
    w = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(hash64(np.asarray(w, dtype=object)))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two shingle-hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def _perm_params(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, n_perm: int = 64, seed: int = 7) -> np.ndarray:
    """((a*h + b) mod 2^64) mod Mersenne61, min over shingles, per perm.

    NOTE (documented deviation): because ``a*h`` runs in wrapping uint64
    with full-range 64-bit shingle hashes (and ``a`` is not forced odd),
    this is NOT the textbook pairwise-independent ((a*h+b) mod p) family —
    the banding recall formula 1-(1-J^rows)^bands is an approximation
    here, not an exact bound. Every LSH candidate is verified by EXACT
    Jaccard downstream, so precision is unaffected; only theoretical
    recall at the threshold carries the approximation (planted-pair e2e
    tests + the exact-all-pairs oracle pin observed recall at 100% on
    the tested worlds). Kept as-is: the signature values are baked into
    goldens/oracles, and the exact-verify design never relied on the
    bound."""
    a, b = _perm_params(n_perm, seed)
    if shingles.size == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_perm, n_shingles) in uint64 with Mersenne modulus via python-free numpy
    h = shingles.astype(np.uint64)
    prod = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Hash each band of the signature -> (bands,) uint64 bucket keys.
    Docs sharing any (band_id, key) are candidate near-dups."""
    rows = sig.shape[0] // bands
    out = np.empty(bands, dtype=np.uint64)
    for bi in range(bands):
        chunk = sig[bi * rows:(bi + 1) * rows]
        acc = np.uint64(1469598103934665603)
        for v in chunk.tolist():
            acc = np.uint64((int(acc) ^ int(v)) * 1099511628211 % (1 << 64))
        out[bi] = acc
    return out


def batch_band_keys(texts: np.ndarray, n_perm: int = 128, bands: int = 64,
                    seed: int = 7) -> np.ndarray:
    """(n_docs, bands) uint64 LSH bucket keys for a batch of documents.

    Vectorized across docs for the band-FNV fold (the per-doc shingle pass
    stays per-doc — doc granularity). r = n_perm//bands rows per band;
    the default r=2/b=64 makes P(candidate | J=0.5) = 1-(1-0.25)^64 ≈ 1-1e-8,
    so the LSH candidate set is exhaustive at the 0.5 verify threshold and
    the exact-Jaccard oracle SQL matches the LSH+verify pipeline output."""
    n = len(texts)
    sigs = np.stack([minhash_signature(shingle_hashes(t.split()), n_perm, seed)
                     for t in texts]) if n else np.empty((0, n_perm), np.uint64)
    rows = n_perm // bands
    chunks = sigs.reshape(n, bands, rows)
    acc = np.full((n, bands), 1469598103934665603, dtype=np.uint64)
    for r in range(rows):
        acc = (acc ^ chunks[:, :, r]) * np.uint64(1099511628211)
    return acc


def simhash64(tokens: list[str]) -> np.uint64:
    """64-bit SimHash over whitespace tokens (unit weights). Token hash is
    md5_number_lower (DuckDB-matchable) so the code column is
    oracle-checkable; bit b set iff the per-bit +/-1 vote sum is > 0."""
    from .text import md5_token_hash64

    if not tokens:
        return np.uint64(0)
    th = md5_token_hash64(tokens)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    code = np.uint64(0)
    for b in np.where(v > 0)[0].tolist():
        code |= np.uint64(1) << np.uint64(b)
    return code


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (broadcast)."""
    x = np.bitwise_xor(a, b)
    # popcount via bit tricks on uint64
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def myers_distance_batch(a: list[bytes], b: list[bytes]) -> np.ndarray:
    """Vectorized bit-parallel Levenshtein distance (Myers, JACM 1999)
    for string pairs with max(len) <= 64: each pattern fits one uint64
    bit-vector, and the whole pair axis advances in lock-step numpy uint64
    ops — no per-pair Python DP.  Cost: O(maxlen) vector steps per batch
    regardless of pair count; the verify stage of the edit-distance
    near-dup join runs entirely through here.

    Unit-cost insert/delete/substitute — identical semantics to DuckDB's
    ``levenshtein`` (the oracle side)."""
    npairs = len(a)
    if npairs == 0:
        return np.empty(0, dtype=np.int64)
    alen = np.array([len(x) for x in a], dtype=np.int64)
    blen = np.array([len(x) for x in b], dtype=np.int64)
    if alen.max(initial=0) > 64 or blen.max(initial=0) > 64:
        raise ValueError("myers_distance_batch handles strings up to 64")
    maxa, maxb = int(alen.max(initial=0)), int(blen.max(initial=0))
    amat = np.zeros((npairs, max(maxa, 1)), dtype=np.uint8)
    bmat = np.zeros((npairs, max(maxb, 1)), dtype=np.uint8)
    for i, x in enumerate(a):
        amat[i, : len(x)] = np.frombuffer(x, np.uint8)
    for i, x in enumerate(b):
        bmat[i, : len(x)] = np.frombuffer(x, np.uint8)
    # compact per-batch alphabet so Peq is (npairs, K), not (npairs, 256)
    alpha = np.unique(np.concatenate([amat.ravel(), bmat.ravel()]))
    acode = np.searchsorted(alpha, amat)
    bcode = np.searchsorted(alpha, bmat)
    peq = np.zeros((npairs, alpha.shape[0]), dtype=np.uint64)
    rows = np.arange(npairs)
    for j in range(maxa):
        live = j < alen
        np.bitwise_or.at(peq, (rows[live], acode[live, j]),
                         np.uint64(1) << np.uint64(j))
    pv = np.full(npairs, ~np.uint64(0), dtype=np.uint64)
    mv = np.zeros(npairs, dtype=np.uint64)
    score = alen.copy()
    hb = np.where(alen > 0,
                  np.uint64(1) << (alen - 1).clip(min=0).astype(np.uint64),
                  np.uint64(0)).astype(np.uint64)
    one = np.uint64(1)
    for j in range(maxb):
        act = (j < blen) & (alen > 0)
        eq = peq[rows, bcode[:, j]]
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        score = score + np.where(act & ((ph & hb) != 0), 1, 0)
        score = score - np.where(act & ((mh & hb) != 0), 1, 0)
        ph = (ph << one) | one
        mh = mh << one
        n_pv = mh | ~(xv | ph)
        n_mv = ph & xv
        pv = np.where(act, n_pv, pv)
        mv = np.where(act, n_mv, mv)
    # empty-pattern pairs: distance is |b| (pure insertions)
    return np.where(alen == 0, blen, score).astype(np.int64)
