"""DBSCAN kernel tests.

Cross-checked against a brute-force O(n^2) re-statement of sklearn's
dbscan_inner algorithm (full distance matrix), plus geometry goldens that
mirror the reference's synthetic two-cluster fixtures
(/root/reference/tests/test_gps.py:76-92: jitter +/-0.0002 deg around two
centers 0.5 deg apart, eps=0.005, min_samples=100).
"""

import numpy as np

from gscap_ray.functions.dbscan import (
    dbscan_labels,
    extract_cluster_centers,
    gps_dbscan,
    top_cluster,
)


def brute_dbscan(x, y, eps, min_samples):
    n = len(x)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    neigh = [np.where(d2[i] <= eps * eps)[0] for i in range(n)]
    core = np.array([len(nb) >= min_samples for nb in neigh])
    labels = np.full(n, -1, dtype=np.int64)
    label = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = []
        j = i
        while True:
            if labels[j] == -1:
                labels[j] = label
                if core[j]:
                    for v in neigh[j]:
                        if labels[v] == -1:
                            stack.append(v)
            if not stack:
                break
            j = stack.pop()
        label += 1
    return labels


def test_two_blobs_and_noise():
    rng = np.random.default_rng(42)
    home = rng.uniform(-0.0002, 0.0002, size=(300, 2)) + [0.0, 0.0]
    work = rng.uniform(-0.0002, 0.0002, size=(250, 2)) + [0.5, 0.5]
    noise = np.array([[0.25, 0.25], [0.7, -0.3]])
    pts = np.vstack([home, work, noise])
    labels = dbscan_labels(pts[:, 0], pts[:, 1], eps=0.005, min_samples=100)
    assert set(labels[:300]) == {0}
    assert set(labels[300:550]) == {1}
    assert set(labels[550:]) == {-1}


def test_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    # clumpy random points: 5 seeded clumps + uniform background
    pts = []
    for k in range(5):
        c = rng.uniform(-1, 1, size=2)
        pts.append(c + rng.normal(0, 0.01, size=(rng.integers(10, 60), 2)))
    pts.append(rng.uniform(-1, 1, size=(100, 2)))
    pts = np.vstack(pts)
    rng.shuffle(pts)
    for eps, ms in [(0.02, 5), (0.05, 10), (0.1, 3)]:
        got = dbscan_labels(pts[:, 0], pts[:, 1], eps, ms)
        want = brute_dbscan(pts[:, 0], pts[:, 1], eps, ms)
        assert np.array_equal(got, want), (eps, ms)


def test_min_samples_counts_self():
    # 3 identical points, min_samples=3 -> all core, one cluster
    x = np.array([1.0, 1.0, 1.0])
    labels = dbscan_labels(x, x, eps=0.1, min_samples=3)
    assert labels.tolist() == [0, 0, 0]
    labels = dbscan_labels(x, x, eps=0.1, min_samples=4)
    assert labels.tolist() == [-1, -1, -1]


def test_gps_dbscan_small_input():
    labels, centers = gps_dbscan(np.array([0.0]), np.array([0.0]))
    assert labels.tolist() == [-1] and centers == []


def test_center_stats_quirks():
    lat = np.array([0.0, 0.0001, 0.0002, 0.0003])
    lon = np.zeros(4)
    labels = np.zeros(4, dtype=np.int64)
    (c,) = extract_cluster_centers(lat, lon, labels)
    assert c["lat"] == round(float(lat.mean()), 5)
    # reference quirk: np.percentile(values, [.25, .75]) -> 0.25th/0.75th
    # percentile, a tiny sliver near the minimum, NOT the quartile spread
    q = np.percentile(lat, [0.25, 0.75])
    assert c["lat_IQR"] == round(float(q[1] - q[0]), 5)
    assert c["lat_std"] == round(float(lat.std(ddof=1)), 5)
    assert c["max_distance_from_center"] > 0


def test_top_cluster_tie_smallest_label():
    labels = np.array([1, 1, 0, 0, -1])
    centers = [dict(cid=0, lat=0.0, lon=0.0), dict(cid=1, lat=1.0, lon=1.0)]
    c, _ = top_cluster(labels, centers)
    assert c["cid"] == 0
