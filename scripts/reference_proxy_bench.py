"""Reference-engine throughput proxy.

The reference publishes no benchmark numbers (BASELINE.md), so this script
measures a faithful *cost model* of its execution shape on this machine and
extrapolates: per consecutive GPS pair it performs a Python-level function
call computing haversine + binning on scalars inside ``list(map(fx, ...))``
(gps.py:838-847), with per-row pandas ``.loc`` tuple extraction. We model
that as a scalar-python loop over our (identical-semantics) kernels — no
reference code is copied — and time it on N rows.

Usage: python scripts/reference_proxy_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scalar_velocity_row(lat_a, lon_a, ts_a, lat_b, lon_b, ts_b):
    """One reference-style row step: scalar haversine + threshold cascade
    (the work gps.py's discrete_velocity does per pair, via math.* scalars)."""
    import math

    r = 6371.0
    p1, p2 = math.radians(lat_a), math.radians(lat_b)
    dlat = p2 - p1
    dlon = math.radians(lon_b) - math.radians(lon_a)
    a = math.sin(dlat / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlon / 2) ** 2
    meters = r * 1000 * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
    seconds = abs(ts_b - ts_a) % 86400
    v = meters / seconds if seconds else float("nan")
    if 0 <= meters < 4.9 or 0 < v < 0.7:
        b = "stationary"
    elif v < 1.5:
        b = "walking"
    elif v < 5.9:
        b = "active"
    elif v < 67.056:
        b = "powered_vehicle"
    elif v < 312.928:
        b = "high_speed_transportation"
    else:
        b = "anomaly"
    return round(meters, 1), seconds, round(v, 3) if v == v else v, b


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rng = np.random.default_rng(0)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-170, 170, n)
    ts = np.cumsum(rng.integers(30, 600, n)).astype(np.int64)

    # reference-shaped: python loop over scalar rows (list(map(fx, pairs)))
    t0 = time.time()
    _ = [scalar_velocity_row(lat[i - 1], lon[i - 1], ts[i - 1],
                             lat[i], lon[i], ts[i]) for i in range(1, n)]
    t_ref = time.time() - t0

    # engine-shaped: the vectorized kernel on the same data
    from gscap_ray.functions.velocity import stream_velocity_features

    t0 = time.time()
    stream_velocity_features(lat, lon, ts * 1_000_000)
    t_vec = time.time() - t0

    print(json.dumps({
        "rows": n,
        "reference_rowloop_sec": round(t_ref, 3),
        "reference_rows_per_sec": round(n / t_ref, 1),
        "engine_kernel_sec": round(t_vec, 4),
        "engine_rows_per_sec": round(n / t_vec, 1),
        "kernel_speedup": round(t_ref / t_vec, 1),
        "note": ("velocity stage only, single core, identical semantics; the "
                 "reference additionally re-extracts each row from pandas via "
                 ".loc (gps.py:838-847), so this UNDERSTATES its real cost"),
    }))


if __name__ == "__main__":
    main()
