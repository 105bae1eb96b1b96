"""Builtin mini-gazetteer: (city, lat, lon, timezone) reference table.

Engine analog of the reference's zipcode gazetteer + KDTree
(/root/reference/gscap/utils.py:57-61; its zips.txt blob is not shipped).
Used as the default timezone lookup for entries tables (J3 ``tz_from_dd``)
and as a demo reference side for the kNN join. A production deployment
swaps in a full gazetteer parquet via the same broadcast pattern.

Coordinates/timezones are public well-known city values. Reference quirk
preserved: the 1-NN metric is euclidean in raw degree space
(utils.py KDTree over (lat, lon)), not haversine.
"""

from __future__ import annotations

import numpy as np

# (name, lat, lon, IANA tz)
CITIES = [
    ("new_york", 40.7128, -74.0060, "America/New_York"),
    ("chicago", 41.8781, -87.6298, "America/Chicago"),
    ("denver", 39.7392, -104.9903, "America/Denver"),
    ("los_angeles", 34.0522, -118.2437, "America/Los_Angeles"),
    ("anchorage", 61.2181, -149.9003, "America/Anchorage"),
    ("honolulu", 21.3069, -157.8583, "Pacific/Honolulu"),
    ("mexico_city", 19.4326, -99.1332, "America/Mexico_City"),
    ("sao_paulo", -23.5505, -46.6333, "America/Sao_Paulo"),
    ("buenos_aires", -34.6037, -58.3816, "America/Argentina/Buenos_Aires"),
    ("london", 51.5074, -0.1278, "Europe/London"),
    ("paris", 48.8566, 2.3522, "Europe/Paris"),
    ("berlin", 52.5200, 13.4050, "Europe/Berlin"),
    ("madrid", 40.4168, -3.7038, "Europe/Madrid"),
    ("rome", 41.9028, 12.4964, "Europe/Rome"),
    ("moscow", 55.7558, 37.6173, "Europe/Moscow"),
    ("istanbul", 41.0082, 28.9784, "Europe/Istanbul"),
    ("cairo", 30.0444, 31.2357, "Africa/Cairo"),
    ("lagos", 6.5244, 3.3792, "Africa/Lagos"),
    ("johannesburg", -26.2041, 28.0473, "Africa/Johannesburg"),
    ("nairobi", -1.2921, 36.8219, "Africa/Nairobi"),
    ("dubai", 25.2048, 55.2708, "Asia/Dubai"),
    ("karachi", 24.8607, 67.0011, "Asia/Karachi"),
    ("delhi", 28.7041, 77.1025, "Asia/Kolkata"),
    ("dhaka", 23.8103, 90.4125, "Asia/Dhaka"),
    ("bangkok", 13.7563, 100.5018, "Asia/Bangkok"),
    ("singapore", 1.3521, 103.8198, "Asia/Singapore"),
    ("shanghai", 31.2304, 121.4737, "Asia/Shanghai"),
    ("tokyo", 35.6762, 139.6503, "Asia/Tokyo"),
    ("seoul", 37.5665, 126.9780, "Asia/Seoul"),
    ("sydney", -33.8688, 151.2093, "Australia/Sydney"),
    ("auckland", -36.8485, 174.7633, "Pacific/Auckland"),
    ("utc_island", 0.0, 0.0, "UTC"),
]

_LAT = np.array([c[1] for c in CITIES])
_LON = np.array([c[2] for c in CITIES])
_TZ = np.array([c[3] for c in CITIES], dtype=object)
_NAME = np.array([c[0] for c in CITIES], dtype=object)


def tz_from_dd(lat, lon) -> np.ndarray:
    """Vectorized 1-NN timezone lookup (euclidean degrees, reference
    semantics utils.py:163-181)."""
    from .knn import nearest_neighbor

    idx, _ = nearest_neighbor(np.atleast_1d(lat), np.atleast_1d(lon),
                              _LAT, _LON, metric="euclidean_deg")
    return _TZ[idx]


def city_from_dd(lat, lon, max_distance_deg: float | None = None):
    """1-NN city name; None sentinel past ``max_distance_deg``
    (``zip_from_dd`` -1-sentinel analog, utils.py:121-160)."""
    from .knn import nearest_neighbor

    idx, _ = nearest_neighbor(np.atleast_1d(lat), np.atleast_1d(lon),
                              _LAT, _LON, metric="euclidean_deg",
                              max_distance=max_distance_deg)
    out = np.where(idx >= 0, _NAME[np.maximum(idx, 0)], None)
    return out.astype(object)


def dd_from_city(name: str):
    """Exact-key lookup city -> (lat, lon); (0, 0) sentinel when unknown
    (``dd_from_zip`` semantics, utils.py:102-118)."""
    hit = np.where(_NAME == name)[0]
    if hit.size == 0:
        return 0.0, 0.0
    return float(_LAT[hit[0]]), float(_LON[hit[0]])
