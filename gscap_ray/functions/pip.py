"""Point-in-polygon with a grid-bucketed candidate index (STRtree analog).

The reference's "point -> named place w/ category" lookup is a remote Places
API call keyed by rounded coordinates (/root/reference/gscap/gps.py:504-562);
at engine scale that becomes an offline polygon context layer joined by
point-in-polygon (SURVEY.md §2.4 J10). No shapely exists here, so:

- :func:`points_in_polygon` — vectorized even-odd ray casting (numpy),
  boundary-exclusive on horizontal edges, standard crossing-number rule;
- :class:`PolygonIndex` — bbox grid buckets mapping cell -> candidate polygon
  ids ("prepared STRtree"); built once per actor (stages/enrich.py) and
  queried per batch. First matching polygon id wins (lowest id, matching a
  deterministic layer ordering); -1 = no polygon.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      ring_x: np.ndarray, ring_y: np.ndarray) -> np.ndarray:
    """Even-odd rule membership of points (px, py) in one simple polygon.

    ``ring_x/ring_y`` are the vertex arrays (closing edge implicit).
    Returns a bool mask. Vectorized over points x edges.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1 = np.asarray(ring_x, dtype=np.float64)
    y1 = np.asarray(ring_y, dtype=np.float64)
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)

    inside = np.zeros(px.shape[0], dtype=bool)
    # crossing test per edge, accumulated over edges (edges usually << points)
    for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
        if ey1 == ey2:
            continue  # horizontal edge never crosses the upward ray test
        cond = (ey1 > py) != (ey2 > py)
        with np.errstate(invalid="ignore"):
            xin = (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1
        inside ^= cond & (px < xin)
    return inside


class PolygonIndex:
    """Grid-bucketed polygon candidate index, queried per Arrow batch.

    polygons: list of dicts with keys ``place_id`` (any), ``ring_lat``,
    ``ring_lon`` (sequences). ``cell_deg`` sizes the bucket grid; pick it
    near the median polygon bbox size.
    """

    def __init__(self, polygons, cell_deg: float = 0.25):
        self.cell_deg = float(cell_deg)
        self.rings = []
        self.place_ids = []
        self.bboxes = np.empty((len(polygons), 4), dtype=np.float64)
        self.cell_map: dict[tuple[int, int], list[int]] = {}
        for i, p in enumerate(polygons):
            ry = np.asarray(p["ring_lat"], dtype=np.float64)
            rx = np.asarray(p["ring_lon"], dtype=np.float64)
            self.rings.append((rx, ry))
            self.place_ids.append(p["place_id"])
            bbox = (ry.min(), ry.max(), rx.min(), rx.max())
            self.bboxes[i] = bbox
            for cy in range(int(np.floor(bbox[0] / cell_deg)), int(np.floor(bbox[1] / cell_deg)) + 1):
                for cx in range(int(np.floor(bbox[2] / cell_deg)), int(np.floor(bbox[3] / cell_deg)) + 1):
                    self.cell_map.setdefault((cy, cx), []).append(i)
        # Flat compacted candidate-edge layout for the vectorized query —
        # EIGHT global numpy arrays total, not per-cell objects (a dict of
        # ~50k tiny arrays costs hundreds of ms to unpickle PER WORKER and
        # erased the kernel win when the prebuilt index is broadcast):
        #   _cell_keys   sorted packed (cy<<32|cx) cell ids -> searchsorted
        #   _cell_off    [n_cells+1] slice bounds into the candidate arrays
        #   _cand_ids    ascending polygon ids per cell, concatenated
        #   _cand_off    [n_cands+1] slice bounds into the edge arrays
        #   _ex1/_ey1/_ex2/_ey2   NON-horizontal edges (a horizontal edge
        #       never crosses the upward ray), per candidate, concatenated —
        #       so one cell's edges are ONE contiguous slice.
        # Candidates with zero non-horizontal edges (degenerate polygons)
        # are dropped: the scalar rule could never report a point inside
        # them, and np.add.reduceat returns the ELEMENT at a zero-length
        # segment's offset rather than 0, which would leak a neighbor's edge.
        nh_edges = []  # per polygon id: (ex1, ey1, ex2, ey2) non-horizontal
        for rx, ry in self.rings:
            x2 = np.roll(rx, -1)
            y2 = np.roll(ry, -1)
            keep = ry != y2
            nh_edges.append((rx[keep], ry[keep], x2[keep], y2[keep]))
        keys, cell_counts, cand_ids, edge_counts = [], [], [], []
        for (cy, cx) in sorted(self.cell_map):
            kept = [pi for pi in self.cell_map[(cy, cx)]
                    if nh_edges[pi][0].shape[0]]
            if not kept:
                continue
            # same packing as query(); lexicographic (cy, cx) order is
            # monotone under it for |cx| < 2^31, so _cell_keys stays sorted
            keys.append(np.int64(cy) * np.int64(1 << 32) + np.int64(cx))
            cell_counts.append(len(kept))
            cand_ids.extend(kept)
            edge_counts.extend(nh_edges[pi][0].shape[0] for pi in kept)
        self._cell_keys = np.asarray(keys, dtype=np.int64)
        self._cell_off = np.concatenate([[0], np.cumsum(cell_counts)]).astype(np.int64)
        self._cand_ids = np.asarray(cand_ids, dtype=np.int64)
        self._cand_off = np.concatenate([[0], np.cumsum(edge_counts)]).astype(np.int64)
        e = np.empty(0, dtype=np.float64)
        self._ex1 = np.concatenate([nh_edges[pi][0] for pi in cand_ids]) if cand_ids else e
        self._ey1 = np.concatenate([nh_edges[pi][1] for pi in cand_ids]) if cand_ids else e
        self._ex2 = np.concatenate([nh_edges[pi][2] for pi in cand_ids]) if cand_ids else e
        self._ey2 = np.concatenate([nh_edges[pi][3] for pi in cand_ids]) if cand_ids else e
        # drop the build-time structures before the object is broadcast:
        # keeping the ~50k tiny per-cell lists / per-polygon ring arrays
        # re-paid the exact per-worker unpickle cost the flat layout above
        # exists to remove (query() needs only the flat arrays + an
        # emptiness flag; lookup_place_ids needs place_ids)
        self._has_polygons = bool(self.rings)
        del self.rings, self.bboxes, self.cell_map

    def query(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Index (into the layer) of the first containing polygon, else -1.

        Vectorized per grid cell: ONE (points x candidate-edges) crossing
        matrix, parity per candidate via np.add.reduceat, first odd
        candidate (ascending layer id) wins. Bit-identical to the previous
        per-polygon scalar path: same crossing expression in the same
        left-associative operation order, and the old bbox pre-filter only
        skipped work (odd parity implies strictly inside implies
        bbox-contained — a ray from a point left/right/above/below the
        whole ring crosses it an even number of times), so dropping it
        cannot change results. Point chunks cap the matrix at ~4M cells so
        dense cells don't blow the worker heap."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        n = lat.shape[0]
        out = np.full(n, -1, dtype=np.int64)
        if not self._has_polygons or n == 0:
            return out
        cy = np.floor(lat / self.cell_deg).astype(np.int64)
        cx = np.floor(lon / self.cell_deg).astype(np.int64)
        packed = cy * np.int64(1 << 32) + cx
        order = np.argsort(packed, kind="stable")
        sp = packed[order]
        uniq, starts = np.unique(sp, return_index=True)
        ends = np.append(starts[1:], n)
        pos = np.searchsorted(self._cell_keys, uniq)
        pos[pos >= self._cell_keys.shape[0]] = 0
        known = self._cell_keys[pos] == uniq if self._cell_keys.size else np.zeros(uniq.shape, bool)
        for gi in np.flatnonzero(known):
            s, e, ci0 = starts[gi], ends[gi], pos[gi]
            c0, c1 = self._cell_off[ci0], self._cell_off[ci0 + 1]
            e0, e1 = self._cand_off[c0], self._cand_off[c1]
            cand_ids = self._cand_ids[c0:c1]
            ex1, ey1 = self._ex1[e0:e1], self._ey1[e0:e1]
            ex2, ey2 = self._ex2[e0:e1], self._ey2[e0:e1]
            offsets = self._cand_off[c0:c1] - e0
            idx = order[s:e]
            step = max(1, 4_000_000 // ex1.shape[0])
            for b0 in range(0, idx.shape[0], step):
                ci = idx[b0:b0 + step]
                py = lat[ci][:, None]
                px = lon[ci][:, None]
                cond = (ey1 > py) != (ey2 > py)
                xin = (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1
                hits = cond & (px < xin)
                # reduceat on bool would OR, not count — reinterpret as
                # uint8 (free); uint8 wraparound is mod 256 (even), so the
                # & 1 parity is exact even for >255 crossings per segment
                odd = (np.add.reduceat(hits.view(np.uint8), offsets,
                                       axis=1) & 1).astype(bool)
                any_hit = odd.any(axis=1)
                out[ci] = np.where(any_hit, cand_ids[odd.argmax(axis=1)], -1)
        return out

    def lookup_place_ids(self, idx: np.ndarray):
        """Map query() output to place ids (None for -1)."""
        return [self.place_ids[i] if i >= 0 else None for i in idx]
