"""Geodesic kernels (vectorized numpy).

Semantics match the reference implementation (haversine with R = 6371 km,
meters output): /root/reference/gscap/utils.py:204-228. Golden:
haversine((0,0),(1,0)) rounds to 111194.9 m (reference tests/test_gps.py:586,
tests/test_utils.py:162-167).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371.0 * 1000.0


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters between (lat1,lon1) and (lat2,lon2).

    All arguments may be scalars or numpy arrays (broadcast). float64 math,
    identical formula to the reference so golden scalars match exactly.
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))

    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    # near-antipodal pairs can push a past 1.0 by an ulp, making
    # sqrt(1 - a) NaN (measured ~4% of jittered antipodes) — clip; values
    # for a <= 1 are untouched, and the SQL haversine template clips with
    # the same least(a, 1.0) so engine and oracles stay identical
    a = np.minimum(a, 1.0)
    c = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return EARTH_RADIUS_M * c


def pairwise_distances_m(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """All-pairs haversine distances (i<j), rounded to 1 dp, ascending.

    Reference semantics: gps.py:1070-1100 (``geo_pairwise_distances`` with
    as_array=True). O(n^2) — only for small groups; large-n callers should use
    the kNN index in functions/knn.py instead.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = lat.shape[0]
    if n < 2:
        return np.empty(0, dtype=np.float64)
    iu, ju = np.triu_indices(n, k=1)
    d = haversine_m(lat[iu], lon[iu], lat[ju], lon[ju])
    return np.sort(np.round(d, 1))


def interpolate_points(lat_a, lon_a, lat_b, lon_b, n: int):
    """n linearly spaced points from a to b inclusive (np.linspace semantics,
    matching gps.py:1646-1647)."""
    return (
        np.linspace(lat_a, lat_b, n),
        np.linspace(lon_a, lon_b, n),
    )
