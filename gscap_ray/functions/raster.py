"""Raster <-> vector sampling (C10).

Reference analog: the hourly-weather lookup keyed by (lat, lon, date)
(/root/reference/gscap/weather.py:405-489) — a gridded context value sampled
at point locations. Here a raster layer is a tiled global grid; tiles are
numpy arrays materialized lazily per actor and cached, sampled with nearest
or bilinear interpolation, fully vectorized.

:class:`RasterLayer` is deterministic-synthetic (tile content derived from a
seed + tile index), standing in for e.g. climate/population rasters; a real
deployment would subclass and load tiles from object storage in
``_load_tile`` — the Ray-side plumbing (broadcast config, per-actor tile
cache, vectorized gather) is identical.
"""

from __future__ import annotations

import numpy as np

TILE_DEG = 10.0  # one tile covers 10x10 degrees
PIX_PER_DEG = 20  # 0.05-degree pixels


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
        rng = np.random.default_rng(self.seed * 1_000_003 + ty * 1000 + tx)
        # smooth-ish deterministic field: low-res noise upsampled
        coarse = rng.uniform(0.0, 100.0, size=(n // 10 + 2, n // 10 + 2))
        yy = np.linspace(0, coarse.shape[0] - 2, n)
        xx = np.linspace(0, coarse.shape[1] - 2, n)
        y0 = yy.astype(int); x0 = xx.astype(int)
        fy = (yy - y0)[:, None]; fx = (xx - x0)[None, :]
        tile = (coarse[y0][:, x0] * (1 - fy) * (1 - fx)
                + coarse[y0 + 1][:, x0] * fy * (1 - fx)
                + coarse[y0][:, x0 + 1] * (1 - fy) * fx
                + coarse[y0 + 1][:, x0 + 1] * fy * fx)
        return tile

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
