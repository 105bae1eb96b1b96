"""Property-based tests (hypothesis) for the core kernels — the reference
ships none (SURVEY.md §5), these go beyond its strategy."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gscap_ray.functions.dbscan import dbscan_labels
from gscap_ray.functions.geo import haversine_m
from gscap_ray.functions.velocity import (
    BINS,
    SECONDS_PER_DAY,
    discrete_velocity_arrays,
)

coord = st.tuples(st.floats(-85, 85), st.floats(-179, 179))


def scalar_reference_bin(lat_a, lon_a, t_a, lat_b, lon_b, t_b):
    """Direct scalar restatement of the reference's discrete_velocity rules
    (gps.py:857-937)."""
    seconds = (abs(t_b - t_a) // 1_000_000) % SECONDS_PER_DAY
    meters = float(haversine_m(lat_a, lon_a, lat_b, lon_b))
    velocity = meters / seconds if seconds != 0 else float("nan")
    if 0 <= meters < 4.9:
        return "stationary"
    if 0 < velocity < 0.7:
        return "stationary"
    if velocity < 1.5:
        return "walking"
    if velocity < 5.9:
        return "active"
    if velocity < 67.056:
        return "powered_vehicle"
    if velocity < 312.928:
        return "high_speed_transportation"
    return "anomaly"


@settings(max_examples=60, deadline=None)
@given(a=coord, b=coord, dt_s=st.integers(0, 3 * SECONDS_PER_DAY))
def test_velocity_kernel_matches_scalar_rules(a, b, dt_s):
    t0, t1 = 0, dt_s * 1_000_000
    d, t, v, c = discrete_velocity_arrays(
        np.array([b[0]]), np.array([b[1]]), np.array([t1]),
        np.array([a[0]]), np.array([a[1]]), np.array([t0]))
    want = scalar_reference_bin(a[0], a[1], t0, b[0], b[1], t1)
    assert BINS[int(c[0])] == want


@settings(max_examples=60, deadline=None)
@given(a=coord, b=coord)
def test_haversine_properties(a, b):
    d_ab = float(haversine_m(a[0], a[1], b[0], b[1]))
    d_ba = float(haversine_m(b[0], b[1], a[0], a[1]))
    assert abs(d_ab - d_ba) < 1e-6          # symmetry
    assert 0 <= d_ab <= 6371000.0 * np.pi + 1  # bounded by half circumference
    assert float(haversine_m(a[0], a[1], a[0], a[1])) == 0.0


@settings(max_examples=30, deadline=None)
@given(st.lists(coord, min_size=1, max_size=40), st.integers(0, 16))
def test_s2_roundtrip_property(points, level):
    from gscap_ray.functions.cells import s2_cell_center, s2_cell_id, s2_parent

    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    ids = s2_cell_id(lat, lon, level)
    clat, clon = s2_cell_center(ids)
    assert np.array_equal(s2_cell_id(clat, clon, level), ids)
    if level > 0:
        parents = s2_parent(ids, level - 1)
        assert np.array_equal(parents, s2_cell_id(lat, lon, level - 1))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.floats(-1, 1), st.floats(-1, 1)),
                min_size=2, max_size=80),
       st.floats(0.01, 0.3), st.integers(2, 8))
def test_dbscan_matches_bruteforce_property(points, eps, min_samples):
    x = np.array([p[0] for p in points])
    y = np.array([p[1] for p in points])
    got = dbscan_labels(x, y, eps, min_samples)
    # brute dbscan_inner restatement
    n = len(x)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    neigh = [np.where(d2[i] <= eps * eps)[0] for i in range(n)]
    core = np.array([len(nb) >= min_samples for nb in neigh])
    want = np.full(n, -1, dtype=np.int64)
    label = 0
    for i in range(n):
        if want[i] != -1 or not core[i]:
            continue
        stack, j = [], i
        while True:
            if want[j] == -1:
                want[j] = label
                if core[j]:
                    stack.extend(v for v in neigh[j] if want[v] == -1)
            if not stack:
                break
            j = stack.pop()
        label += 1
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from("abc"), min_size=1, max_size=60))
def test_runlength_sessions_property(labels):
    """Run-length encoding (sessionize core): number of runs equals number
    of label changes + 1, and run boundaries reconstruct the sequence."""
    import pandas as pd

    s = pd.Series(labels)
    change = s.ne(s.shift()).values
    runs = np.cumsum(change)
    n_runs = runs[-1]
    assert n_runs == int(change.sum())
    # reconstruct
    recon = []
    for r in range(1, n_runs + 1):
        seg = s[runs == r]
        assert seg.nunique() == 1
        recon.extend(seg.tolist())
    assert recon == labels
