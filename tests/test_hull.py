"""Convex hull: kernel fuzz vs the oracle's edge test, hull-of-hulls
invariance, and the FULL-data distributed path (no representative cap)
cross-checked against a single-shot chain at sf0.001."""

import numpy as np
import pyarrow as pa
import pytest

from gscap_ray.functions.hull import convex_hull_ints

SF = "/root/testdata/sf0.001"


def _brute_extreme(pts: np.ndarray) -> set:
    """Strict extreme points by the SQL oracle's directed-edge test."""
    m = len(pts)
    if m == 1:
        return {tuple(pts[0])}
    if m == 2:
        return {tuple(p) for p in pts}
    ext = set()
    for i in range(m):
        for j in range(m):
            if i == j:
                continue
            a, b = pts[i], pts[j]
            ok = True
            for k in range(m):
                if k in (i, j):
                    continue
                r = pts[k]
                cr = (b[0]-a[0])*(r[1]-a[1]) - (b[1]-a[1])*(r[0]-a[0])
                dt = (r[0]-a[0])*(b[0]-a[0]) + (r[1]-a[1])*(b[1]-a[1])
                l2 = (b[0]-a[0])**2 + (b[1]-a[1])**2
                if not (cr < 0 or (cr == 0 and 0 < dt < l2)):
                    ok = False
                    break
            if ok:
                ext.add(tuple(a))
                ext.add(tuple(b))
    return ext


def test_kernel_matches_brute_force_edge_test():
    rng = np.random.default_rng(7)
    for _ in range(60):
        n = int(rng.integers(1, 40))
        x = rng.integers(-30, 30, n)
        y = rng.integers(-30, 30, n)
        hx, hy = convex_hull_ints(x, y)
        pts = np.unique(np.stack([x, y], 1), axis=0)
        assert set(zip(hx.tolist(), hy.tolist())) == _brute_extreme(pts)


def test_hull_of_hulls_equals_global_hull():
    rng = np.random.default_rng(11)
    x = rng.integers(-10**6, 10**6, 500)
    y = rng.integers(-10**6, 10**6, 500)
    gx, gy = convex_hull_ints(x, y)
    parts = rng.integers(0, 7, 500)
    ux, uy = [], []
    for p in range(7):
        m = parts == p
        if m.any():
            bx, by = convex_hull_ints(x[m], y[m])
            ux.extend(bx.tolist())
            uy.extend(by.tolist())
    fx, fy = convex_hull_ints(np.array(ux), np.array(uy))
    assert set(zip(fx.tolist(), fy.tolist())) == set(zip(gx.tolist(), gy.tolist()))


def test_degenerate_inputs():
    # single point / duplicates
    hx, hy = convex_hull_ints([3, 3, 3], [4, 4, 4])
    assert hx.tolist() == [3] and hy.tolist() == [4]
    # all collinear -> two extreme endpoints, strictly no interior
    hx, hy = convex_hull_ints([0, 1, 2, 3], [0, 2, 4, 6])
    assert list(zip(hx.tolist(), hy.tolist())) == [(0, 0), (3, 6)]
    # square with collinear edge midpoints -> corners only (STRICT hull)
    xs = [0, 1, 2, 0, 2, 0, 1, 2]
    ys = [0, 0, 0, 1, 1, 2, 2, 2]
    hx, hy = convex_hull_ints(xs, ys)
    assert set(zip(hx.tolist(), hy.tolist())) == {(0, 0), (2, 0), (0, 2), (2, 2)}


@pytest.mark.usefixtures("ray_session")
def test_full_data_distributed_hull_matches_single_shot():
    """The registry query caps the oracle at 211 bucket representatives;
    this drives the SAME per-block-chain + final-chain path over EVERY
    sf0.001 point and compares against one numpy chain on the driver."""
    from gscap_ray.queries import _read, derive_points_batch

    def to_int(t: pa.Table) -> pa.Table:
        ilat = np.floor(t["lat"].to_numpy() * 100000.0).astype(np.int64)
        ilon = np.floor(t["lon"].to_numpy() * 100000.0).astype(np.int64)
        return pa.table({"ilon": pa.array(ilon, pa.int64()),
                         "ilat": pa.array(ilat, pa.int64())})

    def chain(t: pa.Table) -> pa.Table:
        hx, hy = convex_hull_ints(t["ilon"].to_numpy(), t["ilat"].to_numpy())
        return pa.table({"ilon": pa.array(hx, pa.int64()),
                         "ilat": pa.array(hy, pa.int64())})

    pts = (_read(SF, "events", ["event_id", "user_id"])
           .map_batches(derive_points_batch, batch_format="pyarrow")
           .map_batches(to_int, batch_format="pyarrow"))
    dist = (pts.map_batches(chain, batch_format="pyarrow")
            .repartition(1).map_batches(chain, batch_format="pyarrow")
            .to_pandas())

    whole = pts.to_pandas()
    hx, hy = convex_hull_ints(whole["ilon"].to_numpy(), whole["ilat"].to_numpy())
    assert dist["ilon"].tolist() == hx.tolist()
    assert dist["ilat"].tolist() == hy.tolist()
    assert len(dist) >= 3
