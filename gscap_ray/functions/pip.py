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

    def query(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Index (into the layer) of the first containing polygon, else -1."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        n = lat.shape[0]
        out = np.full(n, -1, dtype=np.int64)
        if not self.rings or n == 0:
            return out
        cy = np.floor(lat / self.cell_deg).astype(np.int64)
        cx = np.floor(lon / self.cell_deg).astype(np.int64)
        # group points by cell, test candidates per cell (vectorized per poly)
        packed = cy * np.int64(1 << 32) + cx
        order = np.argsort(packed, kind="stable")
        sp = packed[order]
        uniq, starts = np.unique(sp, return_index=True)
        ends = np.append(starts[1:], n)
        for u, s, e in zip(uniq, starts, ends):
            cands = self.cell_map.get((int(cy[order[s]]), int(cx[order[s]])))
            if not cands:
                continue
            idx = order[s:e]
            la, lo = lat[idx], lon[idx]
            res = np.full(idx.shape[0], -1, dtype=np.int64)
            un = np.ones(idx.shape[0], dtype=bool)  # undecided positions
            for pi in cands:  # ascending id -> first match wins
                if not un.any():
                    break
                b = self.bboxes[pi]
                m = un & (la >= b[0]) & (la <= b[1]) & (lo >= b[2]) & (lo <= b[3])
                if not m.any():
                    continue
                pos = np.flatnonzero(m)
                rx, ry = self.rings[pi]
                hit = points_in_polygon(lo[pos], la[pos], rx, ry)
                hp = pos[hit]
                res[hp] = pi
                un[hp] = False
            out[idx] = res
        return out

    def lookup_place_ids(self, idx: np.ndarray):
        """Map query() output to place ids (None for -1)."""
        return [self.place_ids[i] if i >= 0 else None for i in idx]
