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


def test_star_polygon_layer_nonconvex_membership():
    """The pip_poly_join layer: the vectorized grid-bucketed index must
    agree with the scalar per-ring ray cast on probes saturating one
    star's bbox, and the star must actually be non-convex (a bbox-inside
    notch probe lands OUTSIDE)."""
    from gscap_ray.functions.pip import PolygonIndex, points_in_polygon
    from gscap_ray.queries import _star_polygons

    polys = _star_polygons()
    index = PolygonIndex(polys, cell_deg=1.0)

    # dense probe grid over polygon 0's bbox (plus a margin)
    p0 = polys[0]
    ry = np.asarray(p0["ring_lat"]); rx = np.asarray(p0["ring_lon"])
    lat = np.linspace(ry.min() - 0.3, ry.max() + 0.3, 101)
    lon = np.linspace(rx.min() - 0.3, rx.max() + 0.3, 103)
    glat, glon = np.meshgrid(lat, lon, indexing="ij")
    glat, glon = glat.ravel(), glon.ravel()

    got = index.query(glat, glon)
    # scalar reference: lowest polygon id whose ring contains the probe
    want = np.full(glat.shape[0], -1, dtype=np.int64)
    for pid in range(len(polys) - 1, -1, -1):
        p = polys[pid]
        m = points_in_polygon(glon, glat, np.asarray(p["ring_lon"]),
                              np.asarray(p["ring_lat"]))
        want[m] = pid
    assert np.array_equal(got, want)

    inside = want >= 0
    assert inside.any() and (~inside).any()
    # non-convexity: some probe inside the bbox of ring 0 is OUTSIDE it
    # (star notch between two arms)
    in_bbox = ((glat > ry.min()) & (glat < ry.max())
               & (glon > rx.min()) & (glon < rx.max()))
    assert (in_bbox & (want != 0)).any()
    # and the bulk of the central disc is inside
    c_lat = (ry.min() + ry.max()) / 2
    c_lon = (rx.min() + rx.max()) / 2
    near = (np.abs(glat - c_lat) < 0.2) & (np.abs(glon - c_lon) < 0.2)
    assert (want[near] == 0).all()


def test_gridnn_far_ring_exactness():
    """The nearest reference point can sit two rings out while a farther
    one shares the query's cell — the old 'one extra ring' stop rule
    returned the wrong neighbor here."""
    import numpy as np

    from gscap_ray.functions.knn import GridNN

    rlat = np.array([0.0, 2.01])
    rlon = np.array([0.0, 0.99])
    g = GridNN(rlat, rlon, cell_deg=1.0)
    idx, dist = g.query(np.array([0.99]), np.array([0.99]))
    assert idx[0] == 1          # (2.01, 0.99) at 1.02 beats (0,0) at 1.386
    assert abs(dist[0] - 1.02) < 1e-9


def test_gridnn_bruteforce_random_layouts():
    """Exactness over random sparse layouts where rings 0/1 are often
    empty (the dense fixture above never exercised far rings)."""
    import numpy as np

    from gscap_ray.functions.knn import GridNN

    rng = np.random.default_rng(5)
    for _ in range(3):
        R = rng.uniform(-5, 5, (40, 2))     # sparse: many empty cells
        Q = rng.uniform(-5, 5, (300, 2))
        g = GridNN(R[:, 0], R[:, 1], cell_deg=1.0)
        idx, dist = g.query(Q[:, 0], Q[:, 1])
        d2 = np.sqrt(((Q[:, None, :] - R[None, :, :]) ** 2).sum(-1))
        assert np.allclose(dist, d2.min(axis=1))
