"""kNN lookup kernels (vectorized numpy) — broadcast-index join side.

Engine analog of the reference's zipcode-KDTree lookups
(/root/reference/gscap/utils.py:121-201): ``zip_from_dd`` (1-NN with a
distance bound and -1 sentinel), ``tz_from_dd`` (batch 1-NN -> attribute).
Reference quirk preserved as an option: the KDTree there is built on raw
(lat, lon) *degrees* with a euclidean metric (utils.py:57-61), so
``metric='euclidean_deg'`` reproduces it; ``metric='haversine'`` is the
engine default for real distance semantics.

Two shapes:
- brute-force chunked top-k (small reference side, broadcast to every actor);
- :class:`GridNN` with per-cell ring expansion for large reference tables.
"""

from __future__ import annotations

import numpy as np

from .geo import haversine_m

_CHUNK = 4096


def _dist_block(qlat, qlon, rlat, rlon, metric):
    if metric == "haversine":
        return haversine_m(qlat[:, None], qlon[:, None], rlat[None, :], rlon[None, :])
    # euclidean in degree space (reference KDTree semantics)
    return np.sqrt((qlat[:, None] - rlat[None, :]) ** 2 + (qlon[:, None] - rlon[None, :]) ** 2)


def nearest_neighbor(qlat, qlon, rlat, rlon, metric: str = "haversine",
                     max_distance: float | None = None):
    """Brute-force 1-NN. Returns (idx, dist); idx = -1 where dist > bound.

    Ties resolve to the lowest reference index (np.argmin semantics).
    """
    qlat = np.asarray(qlat, dtype=np.float64)
    qlon = np.asarray(qlon, dtype=np.float64)
    rlat = np.asarray(rlat, dtype=np.float64)
    rlon = np.asarray(rlon, dtype=np.float64)
    n = qlat.shape[0]
    idx = np.full(n, -1, dtype=np.int64)
    dist = np.full(n, np.inf)
    if rlat.shape[0] == 0:
        return idx, dist
    for off in range(0, n, _CHUNK):
        d = _dist_block(qlat[off:off + _CHUNK], qlon[off:off + _CHUNK], rlat, rlon, metric)
        j = np.argmin(d, axis=1)
        idx[off:off + _CHUNK] = j
        dist[off:off + _CHUNK] = d[np.arange(d.shape[0]), j]
    if max_distance is not None:
        miss = dist > max_distance
        idx[miss] = -1
    return idx, dist


def knn_topk(qlat, qlon, rlat, rlon, k: int, metric: str = "haversine"):
    """Brute-force k-NN. Returns (idx[n,k], dist[n,k]) sorted ascending by
    distance with index as tiebreak (deterministic)."""
    qlat = np.asarray(qlat, dtype=np.float64)
    qlon = np.asarray(qlon, dtype=np.float64)
    rlat = np.asarray(rlat, dtype=np.float64)
    rlon = np.asarray(rlon, dtype=np.float64)
    n, m = qlat.shape[0], rlat.shape[0]
    k = min(k, m)
    idx = np.empty((n, k), dtype=np.int64)
    dist = np.empty((n, k), dtype=np.float64)
    for off in range(0, n, _CHUNK):
        d = _dist_block(qlat[off:off + _CHUNK], qlon[off:off + _CHUNK], rlat, rlon, metric)
        part = np.argpartition(d, k - 1, axis=1)[:, :k] if k < m else np.tile(np.arange(m), (d.shape[0], 1))
        pd_ = np.take_along_axis(d, part, axis=1)
        # stable sort by (distance, index)
        order = np.lexsort((part, pd_), axis=1)
        idx[off:off + _CHUNK] = np.take_along_axis(part, order, axis=1)
        dist[off:off + _CHUNK] = np.take_along_axis(pd_, order, axis=1)
    return idx, dist


class GridNN:
    """Grid-accelerated 1-NN for large reference tables.

    Buckets reference points into ``cell_deg`` cells; queries search
    expanding square rings and stop only when the next ring's minimum
    possible distance exceeds every query's current best: a point in ring
    r sits at least (r-1)·cell from any query in the center cell, so once
    r·cell > max(best distances) no farther ring can improve — the exact
    bound (the earlier "one extra ring" rule was NOT exact: a candidate
    found at ring 0 can be up to sqrt(2)·cell away while a nearer point
    sits in ring 2). Metric: euclidean in degree space (use for
    prefiltering; exactness under haversine holds away from the poles for
    small cells — documented engine assumption)."""

    def __init__(self, rlat, rlon, cell_deg: float = 1.0):
        self.rlat = np.asarray(rlat, dtype=np.float64)
        self.rlon = np.asarray(rlon, dtype=np.float64)
        self.cell_deg = float(cell_deg)
        cy = np.floor(self.rlat / cell_deg).astype(np.int64)
        cx = np.floor(self.rlon / cell_deg).astype(np.int64)
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        order = np.lexsort((cx, cy))
        keys = list(zip(cy[order].tolist(), cx[order].tolist()))
        start = 0
        for i in range(1, len(keys) + 1):
            if i == len(keys) or keys[i] != keys[start]:
                self.buckets[keys[start]] = order[start:i]
                start = i

    def query(self, qlat, qlon, max_rings: int = 64):
        qlat = np.asarray(qlat, dtype=np.float64)
        qlon = np.asarray(qlon, dtype=np.float64)
        n = qlat.shape[0]
        out_idx = np.full(n, -1, dtype=np.int64)
        out_dist = np.full(n, np.inf)
        cy = np.floor(qlat / self.cell_deg).astype(np.int64)
        cx = np.floor(qlon / self.cell_deg).astype(np.int64)
        # group queries by cell
        packed = cy * np.int64(1 << 32) + cx
        order = np.argsort(packed, kind="stable")
        sp = packed[order]
        uniq, starts = np.unique(sp, return_index=True)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            pts = order[s:e]
            yy, xx = int(cy[pts[0]]), int(cx[pts[0]])
            best_d = np.full(pts.shape[0], np.inf)
            best_i = np.full(pts.shape[0], -1, dtype=np.int64)
            for r in range(max_rings + 2):
                if r == 0:
                    cells = [(yy, xx)]
                else:
                    cells = [(yy + dy, xx + dx)
                             for dy in range(-r, r + 1)
                             for dx in range(-r, r + 1)
                             if max(abs(dy), abs(dx)) == r]
                ring = [self.buckets[c] for c in cells if c in self.buckets]
                if ring:
                    cand = np.concatenate(ring)
                    d = np.sqrt(
                        (qlat[pts, None] - self.rlat[cand][None, :]) ** 2
                        + (qlon[pts, None] - self.rlon[cand][None, :]) ** 2)
                    j = np.argmin(d, axis=1)
                    dj = d[np.arange(d.shape[0]), j]
                    upd = dj < best_d
                    best_d[upd] = dj[upd]
                    best_i[upd] = cand[j[upd]]
                # ring r+1's minimum possible distance to a query in the
                # center cell is r*cell — once that exceeds every query's
                # current best, no farther ring can win
                if np.isfinite(best_d).all() \
                        and r * self.cell_deg > float(best_d.max()):
                    break
            out_idx[pts] = best_i
            out_dist[pts] = best_d
        return out_idx, out_dist
