"""Tests for point-in-polygon and kNN kernels (brute-force cross-checked)."""

import numpy as np

from gscap_ray.functions.knn import GridNN, knn_topk, nearest_neighbor
from gscap_ray.functions.pip import PolygonIndex, points_in_polygon

RNG = np.random.default_rng(5)


def test_pip_square():
    ring_x = np.array([0.0, 1.0, 1.0, 0.0])
    ring_y = np.array([0.0, 0.0, 1.0, 1.0])
    px = np.array([0.5, 1.5, -0.1, 0.99, 0.5])
    py = np.array([0.5, 0.5, 0.5, 0.01, 2.0])
    got = points_in_polygon(px, py, ring_x, ring_y)
    assert got.tolist() == [True, False, False, True, False]


def test_pip_concave():
    # L-shaped polygon
    rx = np.array([0, 2, 2, 1, 1, 0], dtype=float)
    ry = np.array([0, 0, 1, 1, 2, 2], dtype=float)
    inside = points_in_polygon(np.array([1.5, 1.5, 0.5]), np.array([0.5, 1.5, 1.5]), rx, ry)
    assert inside.tolist() == [True, False, True]


def test_polygon_index_matches_bruteforce():
    polys = []
    for i in range(25):
        cx, cy = RNG.uniform(-5, 5, 2)
        w, h = RNG.uniform(0.2, 1.5, 2)
        polys.append(dict(place_id=f"p{i}",
                          ring_lon=[cx - w, cx + w, cx + w, cx - w],
                          ring_lat=[cy - h, cy - h, cy + h, cy + h]))
    idx = PolygonIndex(polys, cell_deg=0.5)
    qlat = RNG.uniform(-6, 6, 2000)
    qlon = RNG.uniform(-6, 6, 2000)
    got = idx.query(qlat, qlon)
    want = np.full(2000, -1, dtype=np.int64)
    for pi in range(len(polys) - 1, -1, -1):  # lowest id wins
        p = polys[pi]
        m = points_in_polygon(qlon, qlat, np.array(p["ring_lon"]), np.array(p["ring_lat"]))
        want[m] = pi
    # brute loop above overwrites with lowest id last
    assert np.array_equal(got, want)
    ids = idx.lookup_place_ids(got[:5])
    assert all(x is None or x.startswith("p") for x in ids)


def test_nearest_neighbor_bound_sentinel():
    # reference zip_from_dd semantics: -1 when nothing within max distance
    rlat = np.array([0.0, 10.0])
    rlon = np.array([0.0, 10.0])
    idx, dist = nearest_neighbor(np.array([0.1, 50.0]), np.array([0.1, 50.0]),
                                 rlat, rlon, metric="euclidean_deg", max_distance=5.0)
    assert idx.tolist() == [0, -1]


def test_knn_topk_sorted_and_exact():
    rlat = RNG.uniform(-1, 1, 300)
    rlon = RNG.uniform(-1, 1, 300)
    qlat = RNG.uniform(-1, 1, 50)
    qlon = RNG.uniform(-1, 1, 50)
    idx, dist = knn_topk(qlat, qlon, rlat, rlon, k=5)
    assert idx.shape == (50, 5)
    assert np.all(np.diff(dist, axis=1) >= 0)
    # cross-check row 0 against full sort
    from gscap_ray.functions.geo import haversine_m
    d0 = haversine_m(np.full(300, qlat[0]), np.full(300, qlon[0]), rlat, rlon)
    want = np.argsort(d0, kind="stable")[:5]
    assert idx[0].tolist() == want.tolist()


def test_gridnn_matches_bruteforce():
    rlat = RNG.uniform(-10, 10, 5000)
    rlon = RNG.uniform(-10, 10, 5000)
    g = GridNN(rlat, rlon, cell_deg=1.0)
    qlat = RNG.uniform(-10, 10, 1000)
    qlon = RNG.uniform(-10, 10, 1000)
    gi, gd = g.query(qlat, qlon)
    bi, bd = nearest_neighbor(qlat, qlon, rlat, rlon, metric="euclidean_deg")
    assert np.array_equal(gi, bi)
    assert np.allclose(gd, bd)
