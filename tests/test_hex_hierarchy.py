"""H3-style invariant property suite for the aperture-7 hex system
(VERDICT r2 #9: canonical icosahedral H3's 122-base-cell numbering stays
re-scoped — deviation #7 — but the hierarchy invariants H3 guarantees are
proven here for hex_cell_id):

- exact aperture-7: every cell has exactly 7 children and one parent;
- parent via lattice arithmetic == geometric nearest-parent-center;
- 6 distinct edge neighbors, symmetric;
- res-7/8/9 edge lengths match H3's published averages within 1%.
"""

import numpy as np

from gscap_ray.functions.cells import (
    _hex_edge,
    hex_cell_center,
    hex_cell_id,
    hex_children,
    hex_neighbors,
    hex_parent,
)

RNG = np.random.default_rng(42)
LATS = RNG.uniform(-65.0, 65.0, 5000)
LONS = RNG.uniform(-175.0, 175.0, 5000)


def test_children_roundtrip_exactly_seven():
    for res in (6, 7, 8):
        cells = np.unique(hex_cell_id(LATS, LONS, res))
        kids = hex_children(cells).reshape(len(cells), 7)
        # 7 DISTINCT children each, disjoint across parents
        assert len(np.unique(kids)) == 7 * len(cells)
        # every child maps back to its parent
        back = hex_parent(kids.ravel())
        assert (back.reshape(len(cells), 7) == cells[:, None]).all()


def test_lattice_parent_equals_geometric_parent():
    """The lattice parent (index-7 sublattice rounding) is the res-r cell
    whose center is nearest the child's center — i.e. the cell geometrically
    containing it. 100% agreement, stronger than H3's 'approximate
    containment'."""
    for res in (7, 8, 9):
        child = hex_cell_id(LATS, LONS, res)
        clat, clon = hex_cell_center(child)
        geo = hex_cell_id(clat, clon, res - 1)
        lat_par = hex_parent(child)
        assert (geo == lat_par).all()


def test_child_centers_near_parent_center():
    """Aperture-7 containment: every child center lies within the parent's
    circumradius (cells are 'size' = circumradius = edge length in deg)."""
    cells = np.unique(hex_cell_id(LATS, LONS, 7))
    kids = hex_children(cells)
    klat, klon = hex_cell_center(kids)
    plat, plon = hex_cell_center(np.repeat(cells, 7))
    d = np.hypot(klat - plat, klon - plon)
    assert (d <= _hex_edge(7) * (1 + 1e-9)).all()


def test_six_distinct_symmetric_neighbors():
    cells = np.unique(hex_cell_id(LATS[:500], LONS[:500], 8))
    nb = hex_neighbors(cells).reshape(len(cells), 6)
    for i, c in enumerate(cells[:50]):
        row = nb[i]
        assert len(set(row.tolist())) == 6
        assert c not in row
        # symmetry: c is a neighbor of each of its neighbors
        for n in row:
            assert c in hex_neighbors(np.array([n], np.uint64))
    # neighbor centers sit at one center-spacing (sqrt(3)*size)
    clat, clon = hex_cell_center(np.repeat(cells, 6))
    nlat, nlon = hex_cell_center(nb.ravel())
    d = np.hypot(nlat - clat, nlon - clon)
    spacing = np.sqrt(3.0) * _hex_edge(8)
    assert np.allclose(d, spacing, rtol=1e-9)


def test_edge_lengths_match_h3_published():
    """H3's published AVERAGE hexagon edge lengths: res7 1.2205 km,
    res8 0.4613 km, res9 0.1744 km. The engine's equirectangular cells
    have this edge length at the equator (1 deg ~ 111.195 km
    great-circle)."""
    km_per_deg = 111.195
    for res, h3_km in ((7, 1.2205), (8, 0.4613), (9, 0.1744)):
        edge_km = _hex_edge(res) * km_per_deg
        assert abs(edge_km - h3_km) / h3_km < 0.01, (res, edge_km)


def test_area_ratio_is_seven():
    """Aperture check: counting distinct cells covering a fixed region,
    each extra resolution multiplies the count by ~7."""
    n7 = len(np.unique(hex_cell_id(LATS, LONS, 7)))
    lat2 = RNG.uniform(10.0, 11.0, 200000)
    lon2 = RNG.uniform(10.0, 11.0, 200000)
    c7 = len(np.unique(hex_cell_id(lat2, lon2, 7)))
    c8 = len(np.unique(hex_cell_id(lat2, lon2, 8)))
    assert 6.0 < c8 / c7 < 8.0
    assert n7 > 0
