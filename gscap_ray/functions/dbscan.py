"""Grid-accelerated DBSCAN (pure numpy) with sklearn-compatible labeling.

Replicates the semantics the reference gets from sklearn's DBSCAN
(/root/reference/gscap/gps.py:1574-1603, defaults gps.py:1804-1828:
eps=0.005 deg, min_samples=100, euclidean on raw (lat, lon) degrees):

- a point is *core* iff |{j : dist(i,j) <= eps}| >= min_samples (self counts);
- labels are assigned by scanning points in index order; each unlabeled core
  point seeds a new cluster and expands depth-first through core neighbors;
  border points keep the first label that reaches them; unreached points are
  noise (-1).  This is sklearn's ``dbscan_inner`` traversal, so cluster ids
  and memberships match exactly (inter-cluster border conflicts resolve by
  cluster seed order, which is identical).

Neighbor queries use an eps/sqrt(2)-sized uniform grid (5x5 cell window)
instead of a ball tree. The fine grid makes the cell diagonal < eps, so
same-cell points are PROVABLY within eps: dense cells (the GPS stay-point
regime) become core without a single distance computation and are claimed
whole during expansion; chunked distance blocks run only against the other
24 window cells. The expansion pass queries neighbors on demand against the
not-yet-labeled subset only, so no O(n * k) neighbor lists are materialized.
(Measured on a 365k-point hot partition: 2.5x over the eps-grid/3x3
variant, with bit-identical labels.)
Intended to run per-key inside ``map_groups``; a cross-partition variant
(tile-local DBSCAN + eps-halo merge) lives at the pipeline layer.
"""

from __future__ import annotations

import numpy as np

_CHUNK = 2048  # rows per distance block in the core-count pass


def _grid_index(x: np.ndarray, y: np.ndarray, h: float):
    """Uniform grid of side ``h``: (cell ids, sort order, unique cells,
    slice starts/ends, grid dims)."""
    cx = np.floor(x / h).astype(np.int64)
    cy = np.floor(y / h).astype(np.int64)
    cx -= cx.min()
    cy -= cy.min()
    ncx = int(cx.max()) + 1
    ncy = int(cy.max()) + 1
    cell = cy * ncx + cx
    order = np.argsort(cell, kind="stable")
    uniq_cells, starts = np.unique(cell[order], return_index=True)
    ends = np.append(starts[1:], x.shape[0])
    return cell, order, uniq_cells, starts, ends, ncx, ncy


def _fine_h(eps: float) -> float:
    """Grid side for the dense-cell shortcut: eps/sqrt(2) shrunk by 1 ulp-ish
    so the cell DIAGONAL is strictly < eps even under float roundoff —
    then any two points sharing a cell are provably within eps and need no
    distance check (pairs at exactly eps are caught by the inclusive
    d2 <= eps2 checks against neighbor cells)."""
    return eps / np.sqrt(2.0) * (1.0 - 1e-12)


# window radius 2: cells at offset k have min point gap (k-1)*h, and
# (2-1)*h < eps <= (3-1)*h, so the 5x5 window covers every pair within eps
_WIN = range(-2, 3)


def _core_pass(x, y, eps, min_samples, grid):
    """Exact core mask over a _fine_h grid. Dense cells (count >=
    min_samples) are auto-core with ZERO distance work — the dominant case
    for GPS stay-points; sparse cells count same-cell members for free and
    run chunked distance blocks against the other 24 window cells only."""
    cell, order, uniq_cells, starts, ends, ncx, ncy = grid
    n = x.shape[0]
    eps2 = eps * eps
    core = np.zeros(n, dtype=bool)
    cell_counts = ends - starts
    cell_slice = {int(c): (int(s), int(e))
                  for c, s, e in zip(uniq_cells, starts, ends)}

    # vectorized 5x5 window-population prefilter (a cell whose window holds
    # fewer than min_samples points cannot contain a core point)
    cyi_a, cxi_a = np.divmod(uniq_cells, ncx)
    wcount = np.zeros(uniq_cells.shape[0], dtype=np.int64)
    last = uniq_cells.shape[0] - 1
    for dy in _WIN:
        for dx in _WIN:
            nb = uniq_cells + dy * ncx + dx
            ok = ((cyi_a + dy >= 0) & (cyi_a + dy < ncy)
                  & (cxi_a + dx >= 0) & (cxi_a + dx < ncx))
            idx = np.clip(np.searchsorted(uniq_cells, nb), 0, last)
            found = ok & (uniq_cells[idx] == nb)
            wcount += np.where(found, cell_counts[idx], 0)

    for c, s, e, wc, cc in zip(uniq_cells, starts, ends, wcount,
                               cell_counts):
        members = order[s:e]
        if cc >= min_samples:      # whole cell auto-core (diagonal < eps)
            core[members] = True
            continue
        if wc < min_samples:
            continue
        cyi, cxi = divmod(int(c), ncx)
        parts = []
        for dy in _WIN:
            yy = cyi + dy
            if yy < 0 or yy >= ncy:
                continue
            base_row = yy * ncx
            for dx in _WIN:
                if dy == 0 and dx == 0:
                    continue       # own cell counted for free below
                xx = cxi + dx
                if 0 <= xx < ncx:
                    sl = cell_slice.get(base_row + xx)
                    if sl is not None:
                        parts.append(order[sl[0]:sl[1]])
        cand = (parts[0] if len(parts) == 1
                else np.concatenate(parts)) if parts else None
        need = min_samples - int(cc)   # same-cell members (incl. self) free
        if cand is None or cand.shape[0] < need:
            continue
        cxv, cyv = x[cand], y[cand]
        m_cand = cand.shape[0]
        for off in range(0, members.shape[0], _CHUNK):
            rows = members[off:off + _CHUNK]
            counts = np.zeros(rows.shape[0], dtype=np.int64)
            undecided = np.arange(rows.shape[0])
            for coff in range(0, m_cand, _CHUNK):
                rr = rows[undecided]
                d2 = (x[rr, None] - cxv[None, coff:coff + _CHUNK]) ** 2 \
                    + (y[rr, None] - cyv[None, coff:coff + _CHUNK]) ** 2
                counts[undecided] += (d2 <= eps2).sum(axis=1)
                undecided = undecided[counts[undecided] < need]
                if undecided.shape[0] == 0:
                    break
            core[rows] = counts >= need
    return core


def dbscan_labels(x: np.ndarray, y: np.ndarray, eps: float, min_samples: int,
                  return_core: bool = False):
    """Euclidean DBSCAN over 2-D points; returns int64 labels (-1 = noise).
    ``return_core=True`` additionally returns the exact core mask pass 1
    already computed (callers needing both avoid a second grid pass —
    the distributed halo-merge's local stage).

    Grid side is eps/sqrt(2) (see :func:`_fine_h`): same-cell points are
    provably within eps, so dense cells are auto-core in pass 1 and are
    claimed whole (no distance blocks) during pass-2 expansion — distance
    math concentrates on sparse boundary cells. Labels are EXACTLY the
    3x3-coarse-grid / sklearn labels: the shortcut only replaces distance
    checks whose outcome is provable, and cluster seed order (index order)
    plus whole-expansion label constancy are unchanged."""
    n = x.shape[0]
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return (labels, np.zeros(0, dtype=bool)) if return_core else labels
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)

    eps2 = eps * eps
    grid = _grid_index(x, y, _fine_h(eps))
    cell, order, uniq_cells, starts, ends, ncx, ncy = grid

    # ---- pass 1: exact core mask with the dense-cell shortcut ----
    core = _core_pass(x, y, eps, min_samples, grid)

    # ---- pass 2: dbscan_inner-equivalent expansion, layer-batched ----
    # dbscan_inner labels a point at pop time, but the label is constant for
    # the whole expansion, so labeling at *discovery* time yields identical
    # final labels; and because every point reached in one expansion gets the
    # SAME label, the traversal order within a cluster is irrelevant — BFS by
    # whole layers reaches exactly the core-connected component that DFS
    # does.  Each layer groups the frontier by grid cell and probes each 5x5
    # window cell with ONE chunked distance block (early exit once every
    # active point is hit) — and a window cell that IS a frontier cell is
    # claimed whole with no distance block at all (same-cell => within eps).
    # Per-cell "active" (unlabeled) index lists shrink as the cluster grows.
    active: dict[int, np.ndarray] = {
        int(c): order[s:e] for c, s, e in zip(uniq_cells, starts, ends)
    }

    def window_cells(ci: int):
        cyi, cxi = divmod(ci, ncx)
        for dy in _WIN:
            yy = cyi + dy
            if yy < 0 or yy >= ncy:
                continue
            base = yy * ncx
            for dx in _WIN:
                xx = cxi + dx
                if 0 <= xx < ncx:
                    yield base + xx

    label = 0
    empty = np.empty(0, dtype=np.int64)
    # seed scan in index order, vectorized in bounded chunks: find the next
    # still-unlabeled core point with a boolean scan over at most _SEED_SCAN
    # core indices at a time, so the total rescan work is
    # O(n_core + clusters * _SEED_SCAN) — fast both for dense few-cluster
    # keys (one long skip per scan) and sparse many-cluster keys (where a
    # whole-remainder rescan per seed would be O(n * clusters))
    _SEED_SCAN = 1024
    core_idx = np.flatnonzero(core)
    ncore = core_idx.shape[0]
    pos = 0
    while pos < ncore:
        blk = core_idx[pos:pos + _SEED_SCAN]
        off = np.flatnonzero(labels[blk] == -1)
        if off.shape[0] == 0:
            pos += blk.shape[0]
            continue
        i = int(blk[off[0]])
        pos += int(off[0]) + 1
        labels[i] = label
        frontier = np.array([i], dtype=np.int64)
        while frontier.shape[0]:
            fcells = cell[frontier]
            fo = np.argsort(fcells, kind="stable")
            fsorted = frontier[fo]
            fc_u, fc_starts = np.unique(fcells[fo], return_index=True)
            fc_ends = np.append(fc_starts[1:], frontier.shape[0])
            probes: dict[int, list[np.ndarray]] = {}
            auto: set[int] = set()     # window cells that ARE frontier cells
            for fci, s, e in zip(fc_u, fc_starts, fc_ends):
                fci = int(fci)
                grp = fsorted[s:e]
                auto.add(fci)          # same cell => within eps, no check
                for wc in window_cells(fci):
                    if wc in probes:
                        probes[wc].append(grp)
                    else:
                        probes[wc] = [grp]
            nxt = []
            for wc, grps in probes.items():
                a = active.get(wc)
                if a is None:
                    continue
                a = a[labels[a] == -1]
                if a.shape[0] == 0:
                    active[wc] = a
                    continue
                if wc in auto:
                    hitm = np.ones(a.shape[0], dtype=bool)
                else:
                    fpts = grps[0] if len(grps) == 1 else np.concatenate(grps)
                    ax, ay = x[a], y[a]
                    hitm = np.zeros(a.shape[0], dtype=bool)
                    und = np.arange(a.shape[0])
                    for co in range(0, fpts.shape[0], _CHUNK):
                        fp = fpts[co:co + _CHUNK]
                        d2 = (ax[und, None] - x[fp][None, :]) ** 2 \
                            + (ay[und, None] - y[fp][None, :]) ** 2
                        h = (d2 <= eps2).any(axis=1)
                        hitm[und[h]] = True
                        und = und[~h]
                        if und.shape[0] == 0:
                            break
                hit = a[hitm]
                if hit.shape[0]:
                    labels[hit] = label
                    nxt.append(hit[core[hit]])
                    active[wc] = a[~hitm]
                else:
                    active[wc] = a
            frontier = np.concatenate(nxt) if nxt else empty
        label += 1
    return (labels, core) if return_core else labels


def core_mask(x: np.ndarray, y: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Exact core-point mask (|eps-ball| >= min_samples) — the same
    dense-cell-shortcut pass 1 as :func:`dbscan_labels`."""
    n = x.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    grid = _grid_index(x, y, _fine_h(eps))
    return _core_pass(x, y, eps, min_samples, grid)


def gps_dbscan(lat: np.ndarray, lon: np.ndarray, eps: float = 0.005, min_samples: int = 100):
    """Reference ``gps_dbscan`` semantics (gps.py:1574-1603).

    <2 records -> all noise, no clusters. Returns (labels, centers) where
    centers is the list of per-cluster stats dicts from
    :func:`extract_cluster_centers`.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if lat.shape[0] < 2:
        return np.full(lat.shape[0], -1, dtype=np.int64), []
    labels = dbscan_labels(lat, lon, eps, min_samples)
    centers = extract_cluster_centers(lat, lon, labels)
    return labels, centers


def extract_cluster_centers(lat: np.ndarray, lon: np.ndarray, labels: np.ndarray):
    """Per-cluster centroid + dispersion stats (gps.py:1002-1067).

    Reference quirks preserved: the 'IQR' uses np.percentile([.25, .75]) —
    the 0.25th/0.75th *percentile*, not quartiles (gps.py:1031,1040); std is
    the sample std (ddof=1, NaN for singleton); max_distance_from_center is
    measured against the unrounded mean; coords rounded to 5 dp, distance to
    3 dp.
    """
    from .geo import haversine_m

    centers = []
    for ci in np.unique(labels):
        if ci == -1:
            continue
        m = labels == ci
        la, lo = lat[m], lon[m]
        lat_mean, lon_mean = la.mean(), lo.mean()
        lat_iqr = np.percentile(la, [0.25, 0.75])
        lon_iqr = np.percentile(lo, [0.25, 0.75])
        with np.errstate(invalid="ignore"):
            lat_std = la.std(ddof=1) if la.size > 1 else np.nan
            lon_std = lo.std(ddof=1) if lo.size > 1 else np.nan
        maxd = float(np.max(haversine_m(la, lo, lat_mean, lon_mean)))
        centers.append(
            dict(
                lat=float(np.round(lat_mean, 5)),
                lon=float(np.round(lon_mean, 5)),
                cid=int(ci),
                lat_range=float(np.round(la.max() - la.min(), 5)),
                lat_IQR=float(np.round(lat_iqr[1] - lat_iqr[0], 5)),
                lat_min=float(np.round(la.min(), 5)),
                lat_max=float(np.round(la.max(), 5)),
                lat_std=float(np.round(lat_std, 5)) if not np.isnan(lat_std) else np.nan,
                lon_range=float(np.round(lo.max() - lo.min(), 5)),
                lon_IQR=float(np.round(lon_iqr[1] - lon_iqr[0], 5)),
                lon_min=float(np.round(lo.min(), 5)),
                lon_max=float(np.round(lo.max(), 5)),
                lon_std=float(np.round(lon_std, 5)) if not np.isnan(lon_std) else np.nan,
                max_distance_from_center=float(np.round(maxd, 3)),
            )
        )
    return centers


def top_cluster(labels: np.ndarray, centers: list[dict]):
    """Most frequent non-noise label's center (gps.py:1788-1801).

    Ties resolve to the smallest label (scipy.stats.mode semantics).
    Returns (center_dict | None, labels).
    """
    lbl = labels[labels != -1]
    if lbl.size == 0:
        return None, labels
    vals, counts = np.unique(lbl, return_counts=True)
    best = int(vals[np.argmax(counts)])
    for c in centers:
        if c.get("cid") == best:
            return c, labels
    return None, labels
