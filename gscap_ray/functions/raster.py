"""Raster <-> vector sampling (C10).

Reference analog: the hourly-weather lookup keyed by (lat, lon, date)
(/root/reference/gscap/weather.py:405-489) — a gridded context value sampled
at point locations. A raster layer is a GLOBAL coarse field; tiles are the
per-actor caching unit (numpy blocks materialized lazily, keyed by tile
index), sampled with nearest or bilinear interpolation, fully vectorized.

The synthetic field is integer-hash arithmetic on the global coarse pixel
index — deterministic AND replicable in oracle SQL (the raster_sample
query), unlike the seeded-RNG field it replaces. Tile contents derive from
*global* indices, so tiles are pure caches: values agree across tile
borders by construction. A real deployment subclasses ``_load_tile`` to
fetch tiles from object storage — the Ray-side plumbing (broadcast layer,
per-actor tile cache, vectorized per-tile gather) is identical.
"""

from __future__ import annotations

import numpy as np

TILE_DEG = 10.0  # one tile covers 10x10 degrees
PIX_PER_DEG = 2  # 0.5-degree coarse pixels

_A = 2654435761
_B = 40503
_M = 2147483648  # 2^31


def field_value(gy: np.ndarray, gx: np.ndarray, seed: int) -> np.ndarray:
    """Global coarse-field value at integer pixel indices — the
    SQL-replicable generator: ((gy*A + gx*B + seed*97) % 2^31) / 2^31 * 100."""
    h = (gy.astype(np.int64) * _A + gx.astype(np.int64) * _B
         + int(seed) * 97) % _M
    return h / 2147483648.0 * 100.0


class RasterLayer:
    def __init__(self, seed: int = 42, pix_per_deg: int = PIX_PER_DEG):
        self.seed = int(seed)
        self.pix_per_deg = int(pix_per_deg)
        self._tiles: dict[tuple[int, int], np.ndarray] = {}

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_tiles"] = {}  # tile cache is per-process, rebuilt lazily
        return d

    def _load_tile(self, ty: int, tx: int) -> np.ndarray:
        n = int(TILE_DEG * self.pix_per_deg)
        rows = ty * n + np.arange(n, dtype=np.int64)
        cols = tx * n + np.arange(n, dtype=np.int64)
        return field_value(rows[:, None], cols[None, :], self.seed)

    def _tile(self, ty: int, tx: int) -> np.ndarray:
        t = self._tiles.get((ty, tx))
        if t is None:
            t = self._load_tile(ty, tx)
            self._tiles[(ty, tx)] = t
        return t

    def sample(self, lat, lon, method: str = "bilinear") -> np.ndarray:
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        # global fractional pixel coords
        gy = (lat + 90.0) * self.pix_per_deg
        gx = (lon + 180.0) * self.pix_per_deg
        if method == "nearest":
            return self._gather(np.round(gy).astype(np.int64), np.round(gx).astype(np.int64))
        y0 = np.floor(gy).astype(np.int64)
        x0 = np.floor(gx).astype(np.int64)
        fy = gy - y0
        fx = gx - x0
        v00 = self._gather(y0, x0)
        v10 = self._gather(y0 + 1, x0)
        v01 = self._gather(y0, x0 + 1)
        v11 = self._gather(y0 + 1, x0 + 1)
        return (v00 * (1 - fy) * (1 - fx) + v10 * fy * (1 - fx)
                + v01 * (1 - fy) * fx + v11 * fy * fx)

    def _gather(self, gy: np.ndarray, gx: np.ndarray) -> np.ndarray:
        npx = int(TILE_DEG * self.pix_per_deg)
        tyx = gy // npx
        txx = gx // npx
        out = np.empty(gy.shape[0], dtype=np.float64)
        # group by tile, vectorized gather per tile
        packed = tyx * 10_000 + txx
        order = np.argsort(packed, kind="stable")
        sp = packed[order]
        uniq, starts = np.unique(sp, return_index=True)
        ends = np.append(starts[1:], gy.shape[0])
        for s, e in zip(starts, ends):
            idx = order[s:e]
            ty, tx = int(tyx[idx[0]]), int(txx[idx[0]])
            tile = self._tile(ty, tx)
            out[idx] = tile[gy[idx] - ty * npx, gx[idx] - tx * npx]
        return out
