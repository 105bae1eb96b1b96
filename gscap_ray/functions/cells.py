"""Spatial cell encoders (pure vectorized numpy, no third-party geo libs).

Three tilings, all uint64 ids:

- :func:`s2_cell_id` — an S2 cell id encoder implemented from the public S2
  geometry spec (s2geometry.io: cube-face projection, quadratic ST transform,
  Hilbert space-filling curve via 4-bit lookup tables). Bit-layout-compatible
  with canonical S2 ids (face << 61 | hilbert_pos << 1 | 1, parent via
  lsb trick), validated here by self-consistency tests (hierarchy, locality,
  round-trip through :func:`s2_cell_center`).
- :func:`hex_cell_id` — an H3-*style* hierarchical hexagon tiling: pointy-top
  axial hex grid over equirectangular (lon, lat) degrees with aperture-7
  resolution steps sized to match H3's average edge lengths (res 7 ~ 1.22 km).
  NOT byte-compatible with canonical H3 (which needs icosahedral gnomonic
  projection); the reference has no H3 analog (its tiling is 5-dp coordinate
  rounding, /root/reference/gscap/gps.py:94-95), so self-consistent ids are
  the contract (SURVEY.md §7 "Hard parts").
- :func:`grid_cell_id` — plain quantized lat/lon grid (SQL-expressible, used
  for DuckDB-oracle'd tile-assignment checks).

The gSCAP analog of tiling is the 5-decimal-place cache-key rounding
(gps.py:94-95) and the zipcode-KDTree lookup (utils.py:57-61); these encoders
generalize that into hierarchical cell ids usable as partition / dedup /
join keys.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- S2 -------

_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)
_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL


def _build_lookup():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int32)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int32)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            ij = r[idx]
            init(level, i + (ij >> 1), j + (ij & 1), orig_orient, pos + idx,
                 orient ^ _POS_TO_ORIENT[idx])

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _latlon_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face, u, v


def _uv_to_st(u):
    # S2 quadratic projection; np.where evaluates both branches so one sqrt
    # sees out-of-domain values — harmless, silenced
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s):
    return np.clip(np.floor(_MAX_SIZE * s), 0, _MAX_SIZE - 1).astype(np.int64)


def s2_cell_id(lat_deg, lon_deg, level: int = 12) -> np.ndarray:
    """Vectorized lat/lon (degrees) -> S2 cell id (uint64) at ``level``."""
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be in [0, {_MAX_LEVEL}]")
    x, y, z = _latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits].astype(np.int64)
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    leaf = n * np.uint64(2) + np.uint64(1)
    return s2_parent(leaf, level)


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of (leaf or finer) cell ids at ``level``."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    neg_lsb = ~lsb + np.uint64(1)  # two's complement -lsb
    return (cell_id & neg_lsb) | lsb


def s2_level(cell_id) -> np.ndarray:
    """Level of each cell id (position of lowest set bit)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (_MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2.0)).astype(np.int64)


def _id_to_face_ij(cell_id: np.ndarray):
    """Decode cell id -> (face, leaf i, leaf j) of the id's position."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = (cid >> np.uint64(61)).astype(np.int64)
    pos = (cid & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    i = np.zeros(cid.shape, dtype=np.int64)
    j = np.zeros(cid.shape, dtype=np.int64)
    bits = face & _SWAP
    nbits = _MAX_LEVEL - 7 * _LOOKUP_BITS  # 2 top bits on first iteration
    for k in range(7, -1, -1):
        bits += ((pos >> np.uint64(k * 2 * _LOOKUP_BITS)).astype(np.int64)
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits].astype(np.int64)
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
        nbits = _LOOKUP_BITS
    return face, i, j


def s2_cell_center(cell_id: np.ndarray):
    """Approximate (lat, lon) degrees of the cell's position (leaf-precision)."""
    face, i, j = _id_to_face_ij(cell_id)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / _MAX_SIZE)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / _MAX_SIZE)
    one = np.ones_like(u)
    # inverse of _xyz_to_face_uv's per-face (u, v) definitions (unnormalized
    # xyz is fine for lat/lon recovery)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [one, -u, -u, -one, v, v])
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [u, one, -v, -v, -one, u])
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [v, v, one, -u, -u, -one])
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


# ------------------------------------------------------------- hex ---------
# Known limitation (documented): the hex and quantized grids tile
# equirectangular (lon, lat) degree space — cells do not wrap across the
# +/-180 dateline and shrink metrically toward the poles. The S2 encoder has
# neither problem (cube-face projection); pipelines that need seamless
# global tiling should key on s2_cell. The reference's own tiling (5-dp
# rounding) shares both limitations.

# res-0 edge length in degrees, aperture 7 (sqrt(7) linear shrink per res);
# sized so res 7 ~ 0.011 deg ~ 1.22 km, matching H3's published average edge
_HEX_EDGE0_DEG = 9.96
_SQRT3 = np.sqrt(3.0)
_HEX_OFFSET = 1 << 27

# Canonical aperture-7 inter-resolution rotation (H3's Class II/III
# alternation, ISEA7H): each finer grid is rotated by
# alpha = atan(sqrt(3)/5) ~ 19.1066 deg so that the coarser lattice is
# EXACTLY the index-7 sublattice of the finer one (generated by axial
# (2, 1), whose hex norm 2^2 + 2*1 + 1^2 = 7). cos/sin are the algebraic
# constants 5/(2*sqrt(7)) and sqrt(3)/(2*sqrt(7)).
_HEX_COS = 0.944911182523068
_HEX_SIN = 0.32732683535398854


def _hex_rot(res: int) -> tuple[float, float]:
    """(cos, sin) of res*alpha via sequential complex product — the SAME
    iteration generates the literals embedded in the SQL oracle, so both
    sides use bit-identical rotation entries."""
    c, s = 1.0, 0.0
    for _ in range(res):
        c, s = c * _HEX_COS - s * _HEX_SIN, c * _HEX_SIN + s * _HEX_COS
    return c, s


def _hex_edge(res: int) -> float:
    return _HEX_EDGE0_DEG / (7.0 ** (res / 2.0))


def hex_cell_id(lat_deg, lon_deg, res: int = 7) -> np.ndarray:
    """Vectorized lat/lon -> H3-style hex cell id (uint64): res<<56|q<<28|r.

    Pointy-top axial coordinates over equirectangular degrees with
    cube-rounding to the nearest hex center. Resolutions form a TRUE
    aperture-7 hierarchy: grid r+1 is scaled by 1/sqrt(7) and rotated by
    alpha relative to grid r, so every res-r cell has exactly 7 res-(r+1)
    children (hex_children) and every cell one parent (hex_parent) — the
    H3 invariants, verified by the property suite in
    tests/test_hex_hierarchy.py (the 122-base-cell icosahedral H3
    numbering itself is re-scoped, deviation #7)."""
    if not 0 <= res <= 15:
        raise ValueError("res must be in [0, 15]")
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    c, s = _hex_rot(res)
    xr = c * x - s * y
    yr = s * x + c * y
    size = _hex_edge(res)
    q = (_SQRT3 / 3.0 * xr - yr / 3.0) / size
    r = (2.0 / 3.0 * yr) / size
    q, r = _cube_round(q, r)
    return ((np.uint64(res) << np.uint64(56))
            | ((q + _HEX_OFFSET).astype(np.uint64) << np.uint64(28))
            | (r + _HEX_OFFSET).astype(np.uint64))


def _cube_round(qf, rf):
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _hex_decode(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    res = (cid >> np.uint64(56)).astype(np.int64)
    q = ((cid >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64) - _HEX_OFFSET
    r = (cid & np.uint64((1 << 28) - 1)).astype(np.int64) - _HEX_OFFSET
    return res, q, r


def _hex_encode(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return ((np.uint64(res) << np.uint64(56))
            | ((q + _HEX_OFFSET).astype(np.uint64) << np.uint64(28))
            | (r + _HEX_OFFSET).astype(np.uint64))


def hex_cell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees of hex cell centers."""
    res, q, r = _hex_decode(cell_id)
    size = _HEX_EDGE0_DEG / (7.0 ** (res / 2.0))
    xr = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    yr = size * (1.5 * r)
    rs = np.atleast_1d(res)
    cs = np.array([_hex_rot(int(v)) for v in rs])
    c = cs[:, 0].reshape(np.shape(res)) if np.ndim(res) else cs[0, 0]
    s = cs[:, 1].reshape(np.shape(res)) if np.ndim(res) else cs[0, 1]
    x = c * xr + s * yr
    y = -s * xr + c * yr
    return y, x  # lat, lon


def _uniform_res(res) -> int:
    """The hierarchy ops are defined per resolution level; a mixed-res
    array would silently re-encode every row at row 0's resolution
    (ADVICE r3) — reject it loudly instead."""
    ra = np.atleast_1d(res)
    if ra.size and (ra != ra[0]).any():
        raise ValueError("mixed-resolution cell_id array: hex_parent/"
                         "hex_children/hex_neighbors need a uniform res "
                         f"(saw {sorted(set(ra.tolist()))})")
    return int(ra[0])


def hex_parent(cell_id) -> np.ndarray:
    """Aperture-7 parent: the coarser lattice is the index-7 sublattice of
    the child lattice (basis (2,1)/(-1,3) in child axial coords), so the
    parent is cube_round(T^-1 (q, r)) with T^-1 = [[3, 1], [-1, 2]]/7 —
    EXACT lattice arithmetic, identical to the geometric
    nearest-parent-center assignment (verified 1.0 agreement in the
    property suite). Empty input -> empty output (batch pipelines
    deliver empty partitions after filters)."""
    if np.atleast_1d(np.asarray(cell_id)).size == 0:
        return np.empty(0, np.int64)
    res, q, r = _hex_decode(cell_id)
    res0 = _uniform_res(res)
    if res0 < 1:
        raise ValueError("res-0 cells have no parent")
    af = (3.0 * q + r) / 7.0
    bf = (-1.0 * q + 2.0 * r) / 7.0
    a, b = _cube_round(af, bf)
    return _hex_encode(res0 - 1, a, b)


# the 7 cosets of the index-7 sublattice: center + its 6 inner offsets
_HEX_COSETS = np.array([(0, 0), (1, 0), (0, 1), (-1, 1),
                        (-1, 0), (0, -1), (1, -1)], dtype=np.int64)


def hex_children(cell_id) -> np.ndarray:
    """The exactly-7 aperture-7 children of each cell: T (a, b) =
    (2a - b, a + 3b) in child axial coords, plus the 6 unit offsets.
    Empty input -> empty output; res-15 cells have no children (15 is
    the max encodable resolution — emitting res-16 ids that hex_cell_id
    itself refuses would corrupt round trips, mirror of hex_parent's
    res-0 guard)."""
    if np.atleast_1d(np.asarray(cell_id)).size == 0:
        return np.empty(0, np.int64)
    res, a, b = _hex_decode(cell_id)
    res0 = _uniform_res(res)
    if res0 >= 15:
        raise ValueError("res-15 cells have no children (max res 15)")
    cq = 2 * a - b
    cr = a + 3 * b
    q = (np.atleast_1d(cq)[:, None] + _HEX_COSETS[None, :, 0]).ravel()
    r = (np.atleast_1d(cr)[:, None] + _HEX_COSETS[None, :, 1]).ravel()
    return _hex_encode(res0 + 1, q, r)


def hex_neighbors(cell_id) -> np.ndarray:
    """The 6 edge neighbors of each cell (axial unit directions).
    Empty input -> empty output."""
    if np.atleast_1d(np.asarray(cell_id)).size == 0:
        return np.empty(0, np.int64)
    res, q, r = _hex_decode(cell_id)
    res0 = _uniform_res(res)
    d = _HEX_COSETS[1:]  # the 6 unit hex directions
    qn = (np.atleast_1d(q)[:, None] + d[None, :, 0]).ravel()
    rn = (np.atleast_1d(r)[:, None] + d[None, :, 1]).ravel()
    return _hex_encode(res0, qn, rn)


# ------------------------------------------------------------- grid --------

def grid_cell_id(lat_deg, lon_deg, cell_deg: float = 0.1) -> np.ndarray:
    """Quantized lat/lon grid cell (int64), SQL-expressible:

    ``floor((lat+90)/cell) * ncols + floor((lon+180)/cell)``.

    Domain convention: half-open on both axes — lat in [-90, 90),
    lon in [-180, 180). At exactly lon = +180 the formula yields
    cx = ncols, which spills into the next latitude row; callers must
    normalize +180 -> -180 (the standard wraparound identity) before
    encoding. The SQL oracle twins replicate this exact formula, so
    engine and oracle agree on ALL inputs including the boundary — the
    convention is about geographic meaning, not parity."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    ncols = np.int64(np.ceil(360.0 / cell_deg))
    cy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
    cx = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
    return cy * ncols + cx


def morton_spread16(x) -> np.ndarray:
    """Spread the low 16 bits of ``x`` onto the even bit positions of a
    32-bit lane (b15..b1b0 -> 0b15..0b1 0b0) with the classic magic-mask
    doubling — the vectorized building block of the Z-order encoder."""
    v = np.asarray(x).astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_key16(qx, qy) -> np.ndarray:
    """32-bit Z-order (Morton) key of two 16-bit quantized coordinates —
    x bits on even positions, y bits on odd.  Keys sharing a high-bit
    prefix share a quadtree tile, so sorting by the key co-locates
    spatial neighbors: the write layout that makes per-file min/max
    pruning effective (reference tiling semantics: gscap/gps.py cluster
    locality; layout technique is standard Z-order curve literature)."""
    return (morton_spread16(qx)
            | (morton_spread16(qy) << np.uint64(1))).astype(np.int64)


def morton_spread32(x) -> np.ndarray:
    """Spread the low 32 bits of ``x`` onto the even bit positions of a
    64-bit lane — the wide variant of :func:`morton_spread16` used by the
    geohash encoder's 20+20-bit interleave."""
    v = np.asarray(x).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


_GEOHASH32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"))


def geohash_uint(lat_deg, lon_deg, precision: int = 8) -> np.ndarray:
    """Canonical geohash as the raw ``5*precision``-bit integer (uint64):
    quantize lon/lat to ``5p/2`` bits each and bit-interleave with lon on
    the even positions counting from the MSB — exactly the public geohash
    spec (Niemeyer 2008), bit-for-bit. Even precision only (odd precisions
    give lon one extra bit, which the symmetric interleave can't express).
    """
    if precision % 2:
        raise ValueError("geohash_uint: even precision only")
    nb = 5 * precision // 2
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    scale = float(2**nb)
    lx = np.minimum(np.floor((lon + 180.0) / 360.0 * scale),
                    scale - 1).astype(np.uint64)
    ly = np.minimum(np.floor((lat + 90.0) / 180.0 * scale),
                    scale - 1).astype(np.uint64)
    return (morton_spread32(lx) << np.uint64(1)) | morton_spread32(ly)


def geohash_encode(lat_deg, lon_deg, precision: int = 8) -> np.ndarray:
    """Canonical base-32 geohash strings (validated against the published
    test vector: (57.64911, 10.40744) -> 'u4pruydq'). Vectorized: one
    interleave + ``precision`` fancy-index/concat passes, no per-row
    Python."""
    v = geohash_uint(lat_deg, lon_deg, precision)
    out = None
    for j in range(precision):
        code = ((v >> np.uint64(5 * (precision - 1 - j)))
                & np.uint64(31)).astype(np.int64)
        c = _GEOHASH32[code]
        out = c if out is None else np.char.add(out, c)
    return out


def hilbert_key(qx, qy, order: int = 8) -> np.ndarray:
    """Hilbert-curve index of two ``order``-bit quantized coordinates —
    the locality-preserving alternative to :func:`morton_key16` for file
    layout: unlike Z-order, consecutive keys are ALWAYS edge-adjacent
    cells (verified by the full-grid adjacency test), so key-range file
    runs have minimal perimeter and per-file min/max pruning is tighter.
    Standard xy2d construction (quadrant digit (3*rx)^ry, then
    full-grid reflect + swap when ry==0 — the n-1 reflection keeps
    coordinates in [0, 2^order) at every level, so the SQL mirror's
    ``//``/``%`` never sees a negative operand), vectorized over numpy
    lanes; all-integer, reproducible in SQL as unrolled per-level CTEs."""
    nfull = 1 << order
    x = np.asarray(qx).astype(np.int64).copy()
    y = np.asarray(qy).astype(np.int64).copy()
    d = np.zeros_like(x)
    s = nfull >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        refl = (ry == 0) & (rx == 1)
        x_r = np.where(refl, nfull - 1 - x, x)
        y_r = np.where(refl, nfull - 1 - y, y)
        x, y = (np.where(ry == 0, y_r, x_r), np.where(ry == 0, x_r, y_r))
        s >>= 1
    return d
