"""Golden-parity tests for the geo + velocity kernels.

Expected values come from the reference's unit tests
(/root/reference/tests/test_gps.py:475-546, tests/test_utils.py:162-167) and
its 7-row fixture geometry (tests/some_gps.csv).
"""

import numpy as np

from gscap_ray.functions.geo import haversine_m, pairwise_distances_m
from gscap_ray.functions.velocity import (
    BINS,
    codes_to_labels,
    discrete_velocity_arrays,
    stream_velocity_features,
)

US = 1_000_000


def _ts(minutes: float) -> int:
    return int(minutes * 60 * US)


def test_haversine_golden_one_degree():
    # reference golden: 111194.9 m for 1 degree of latitude
    assert round(float(haversine_m(0, 0, 1, 0)), 1) == 111194.9


def test_pairwise_distances():
    d = pairwise_distances_m(np.array([0.0, 1.0]), np.array([0.0, 0.0]))
    assert d.tolist() == [111194.9]
    d3 = pairwise_distances_m(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    assert len(d3) == 3


def test_stream_velocity_golden_first_pair():
    # some_gps.csv rows 1-2: (40,-45) -> (40.0001,-45), 1 minute apart
    lat = np.array([40.0, 40.0001])
    lon = np.array([-45.0, -45.0])
    ts = np.array([_ts(0), _ts(1)])
    disp, td, vel, codes = stream_velocity_features(lat, lon, ts)
    assert np.isnan(disp[0]) and codes[0] == 0  # null first row
    assert disp[1] == 11.1
    assert td[1] == 60
    assert vel[1] == 0.185
    assert codes_to_labels(codes)[1] == "stationary"


def _bin_of(a, b, minutes):
    d, t, v, c = discrete_velocity_arrays(
        np.array([b[0]]), np.array([b[1]]), np.array([_ts(minutes)]),
        np.array([a[0]]), np.array([a[1]]), np.array([0]),
    )
    return BINS[int(c[0])]


SEATTLE_A = (47.679853, -122.325744)
SEATTLE_B = (47.673600, -122.364783)
SLC = (40.772849, -111.838413)


def test_bin_powered():
    assert _bin_of(SEATTLE_A, SEATTLE_B, 1) == "powered_vehicle"


def test_bin_walking():
    assert _bin_of(SEATTLE_A, SEATTLE_B, 60) == "walking"


def test_bin_stationary():
    assert _bin_of(SEATTLE_A, SEATTLE_A, 60) == "stationary"


def test_bin_active():
    assert _bin_of(SEATTLE_A, SEATTLE_B, 30) == "active"


def test_bin_high_speed():
    assert _bin_of(SEATTLE_A, SLC, 120) == "high_speed_transportation"


def test_bin_anomaly_nans_metrics():
    d, t, v, c = discrete_velocity_arrays(
        np.array([SLC[0]]), np.array([SLC[1]]), np.array([_ts(1)]),
        np.array([SEATTLE_A[0]]), np.array([SEATTLE_A[1]]), np.array([0]),
    )
    assert BINS[int(c[0])] == "anomaly"
    assert np.isnan(d[0]) and np.isnan(t[0]) and np.isnan(v[0])


def test_caps_18h_null():
    # 19 h gap, stationary displacement -> null row
    lat = np.array([0.0, 0.0])
    lon = np.array([0.0, 0.0])
    ts = np.array([0, _ts(19 * 60)])
    disp, td, vel, codes = stream_velocity_features(lat, lon, ts)
    assert codes[1] == 0 and np.isnan(td[1])


def test_caps_active_12h_null():
    # velocity in active band with >12 h time delta -> null
    # 13 h at 3 m/s -> 140.4 km northward ~ 1.263 degrees
    secs = 13 * 3600
    meters = 3.0 * secs
    dlat = meters / 111194.92664455873
    lat = np.array([0.0, dlat])
    lon = np.array([0.0, 0.0])
    ts = np.array([0, secs * US])
    disp, td, vel, codes = stream_velocity_features(lat, lon, ts)
    assert codes[1] == 0 and np.isnan(vel[1])


def test_day_wrap_quirk():
    # reference uses timedelta.seconds: a 25 h gap reads as 1 h
    lat = np.array([0.0, 0.0])
    lon = np.array([0.0, 0.0])
    ts = np.array([0, _ts(25 * 60)])
    disp, td, vel, codes = stream_velocity_features(lat, lon, ts)
    assert td[1] == 3600.0
