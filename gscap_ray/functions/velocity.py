"""Velocity binning kernels (vectorized numpy).

Semantics replicate the reference exactly (thresholds, rounding, caps):
- ``discrete_velocity``: /root/reference/gscap/gps.py:857-937
- ``process_velocities`` caps: gps.py:799-854 (18 h null cap, 12 h active cap)

Reference quirks intentionally preserved:
- ``time_delta`` is ``timedelta.seconds`` (gps.py:885-889), i.e. the
  whole-seconds component *excluding days* — a >24 h gap wraps modulo 86400.
- bin thresholds compare the *unrounded* velocity; output velocity is rounded
  to 3 dp, displacement to 1 dp (gps.py:932-936).
- anomaly rows (v >= 312.928 m/s) have NaN displacement/time_delta/velocity.
Golden: 11.1 m / 60 s / 0.185 m/s => 'stationary' (tests/test_gps.py:483-486).
"""

from __future__ import annotations

import numpy as np

from .geo import haversine_m

BIN_NULL = "null"
BIN_STATIONARY = "stationary"
BIN_WALKING = "walking"
BIN_ACTIVE = "active"
BIN_POWERED = "powered_vehicle"
BIN_HST = "high_speed_transportation"
BIN_ANOMALY = "anomaly"

BINS = [BIN_NULL, BIN_STATIONARY, BIN_WALKING, BIN_ACTIVE, BIN_POWERED, BIN_HST, BIN_ANOMALY]

# thresholds (m/s) — gps.py:896-930
STATIONARY_MAX_METERS = 4.9
STATIONARY_MAX_V = 0.7
WALKING_MAX_V = 1.5
ACTIVE_MAX_V = 5.9
POWERED_MAX_V = 67.056
HST_MAX_V = 312.928

# process_velocities caps — gps.py:824-828
NULL_CAP_SECONDS = 60 ** 2 * 18
ACTIVE_CAP_SECONDS = 60 ** 2 * 12

SECONDS_PER_DAY = 86400


def discrete_velocity_arrays(lat_a, lon_a, ts_us_a, lat_b, lon_b, ts_us_b):
    """Vectorized ``discrete_velocity`` over pair arrays.

    ``ts_us_*`` are int64 epoch microseconds. Returns
    (displacement_m_1dp, time_delta_s, velocity_3dp, bin_codes) where
    bin_codes indexes into ``BINS``. Caps from process_velocities are NOT
    applied here — see :func:`apply_stream_caps`.
    """
    lat_a = np.asarray(lat_a, dtype=np.float64)
    lon_a = np.asarray(lon_a, dtype=np.float64)
    lat_b = np.asarray(lat_b, dtype=np.float64)
    lon_b = np.asarray(lon_b, dtype=np.float64)
    diff = np.abs(np.asarray(ts_us_b, dtype=np.int64) - np.asarray(ts_us_a, dtype=np.int64))
    # timedelta.seconds semantics: whole seconds excluding days
    seconds = (diff // 1_000_000) % SECONDS_PER_DAY

    meters = haversine_m(lat_a, lon_a, lat_b, lon_b)
    with np.errstate(divide="ignore", invalid="ignore"):
        velocity = np.where(seconds != 0, meters / np.maximum(seconds, 1), np.nan)

    stationary = (meters < STATIONARY_MAX_METERS) | (
        (velocity > 0) & (velocity < STATIONARY_MAX_V)
    )
    # np.select evaluates in order; NaN velocity fails every comparison -> anomaly
    codes = np.select(
        [
            stationary,
            velocity < WALKING_MAX_V,
            velocity < ACTIVE_MAX_V,
            velocity < POWERED_MAX_V,
            velocity < HST_MAX_V,
        ],
        [1, 2, 3, 4, 5],
        default=6,
    ).astype(np.int8)

    disp = np.round(meters, 1)
    vel = np.round(velocity, 3)
    td = seconds.astype(np.float64)
    anomaly = codes == 6
    disp[anomaly] = np.nan
    vel[anomaly] = np.nan
    td[anomaly] = np.nan
    return disp, td, vel, codes


def apply_stream_caps(disp, td, vel, codes):
    """Apply process_velocities' long-gap caps in place (gps.py:824-828).

    Rows with time_delta > 18 h, or 'active' with time_delta > 12 h, become
    null rows (NaN metrics, binning 'null'). Returns the same four arrays.
    """
    nullify = (td > NULL_CAP_SECONDS) | ((codes == 3) & (td > ACTIVE_CAP_SECONDS))
    disp[nullify] = np.nan
    td[nullify] = np.nan
    vel[nullify] = np.nan
    codes[nullify] = 0
    return disp, td, vel, codes


def stream_velocity_features(lat, lon, ts_us):
    """``process_velocities`` over ONE ts-sorted stream (gps.py:799-854).

    Returns (displacement, time_delta, velocity, codes) aligned with the
    input; row 0 is the null row.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    n = lat.shape[0]
    disp = np.full(n, np.nan)
    td = np.full(n, np.nan)
    vel = np.full(n, np.nan)
    codes = np.zeros(n, dtype=np.int8)
    if n < 2:
        return disp, td, vel, codes
    d, t, v, c = discrete_velocity_arrays(
        lat[1:], lon[1:], ts_us[1:], lat[:-1], lon[:-1], ts_us[:-1]
    )
    d, t, v, c = apply_stream_caps(d, t, v, c)
    disp[1:], td[1:], vel[1:], codes[1:] = d, t, v, c
    return disp, td, vel, codes


def codes_to_labels(codes: np.ndarray) -> np.ndarray:
    """int8 bin codes -> string labels (object array)."""
    lut = np.asarray(BINS, dtype=object)
    return lut[codes]
