"""Spatial cell indexes: S2 cell ids + hexagonal k-ring cells.

* ``s2_cell_id`` is a faithful, vectorized implementation of the
  public S2 geometry cell id algorithm (quadratic ST projection on
  cube faces + Hilbert curve position, lookup tables generated from
  the published base orders). Level 0-30, 64-bit ids bit-compatible
  with the reference S2 scheme.
* ``hex_cell`` / ``hex_k_ring`` provide H3-style hexagonal cells at
  resolutions 7-12. The real ``h3`` library is used when importable;
  this sandbox has none, so the fallback is an axial-coordinate
  hexagonal grid on an equirectangular projection with aperture-√7
  scaling per resolution (edge lengths sized to match H3's published
  averages). Ids are NOT bit-compatible with Uber H3 in fallback
  mode — documented, deterministic, and the k-ring neighborhood
  semantics (what kNN candidate expansion needs) are exact hexagon
  adjacency either way.

These are the "cell index columns" of SURVEY.md §1.2, computed
vectorized inside map_batches (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - not installed in this sandbox
    import h3 as _h3  # noqa: F401

    HAVE_H3 = True
except ImportError:
    HAVE_H3 = False

# --------------------------------------------------------------------------
# S2 (public algorithm; tables generated from the base orders)
# --------------------------------------------------------------------------

_SWAP = 1
_INVERT = 2
_LOOKUP_BITS = 4
_MAX_LEVEL = 30
_POS_TO_IJ = np.array([[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            init(
                level,
                i + (int(r[index]) >> 1),
                j + (int(r[index]) & 1),
                orig_orientation,
                pos + index,
                orientation ^ int(_POS_TO_ORIENT[index]),
            )

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    face = face + 3 * (
        np.where(face == 0, x, np.where(face == 1, y, z)) < 0
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        xf, yf, zf = x[m], y[m], z[m]
        if f == 0:
            u[m], v[m] = yf / xf, zf / xf
        elif f == 1:
            u[m], v[m] = -xf / yf, zf / yf
        elif f == 2:
            u[m], v[m] = -xf / zf, -yf / zf
        elif f == 3:
            u[m], v[m] = zf / xf, yf / xf
        elif f == 4:
            u[m], v[m] = zf / yf, -xf / yf
        else:
            u[m], v[m] = -yf / zf, -xf / zf
    return face, u, v


def _uv_to_st(u):
    # quadratic projection (the S2_QUADRATIC_PROJECTION default)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def s2_cell_id(lon_deg: np.ndarray, lat_deg: np.ndarray, level: int = 12) -> np.ndarray:
    """Vectorized lon/lat (degrees) → S2 cell id (uint64) at ``level``."""
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError("level must be 0..30")
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    x = cos_lat * np.cos(lon)
    y = cos_lat * np.sin(lon)
    z = np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    max_size = 1 << _MAX_LEVEL
    i = np.clip((s * max_size).astype(np.int64), 0, max_size - 1)
    j = np.clip((t * max_size).astype(np.int64), 0, max_size - 1)

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    cell_id = n * np.uint64(2) + np.uint64(1)  # leaf (level 30)
    if level == _MAX_LEVEL:
        return cell_id
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return (cell_id & (~(lsb - np.uint64(1)) + np.uint64(0))) | lsb


def s2_level(cell_id: np.ndarray) -> np.ndarray:
    """Level of a cell id (position of the lowest set bit)."""
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    lvl = _MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) // 2)
    return lvl


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return (c & ~(lsb - np.uint64(1))) | lsb


# --------------------------------------------------------------------------
# hex cells (H3-style; fallback axial grid when h3 is absent)
# --------------------------------------------------------------------------

# average H3 edge lengths in degrees-ish scale for the fallback grid
_HEX_BASE_EDGE_DEG = 0.25  # res 5 scale anchor
_SQRT7 = np.sqrt(7.0)
_SQRT3 = np.sqrt(3.0)


def _hex_size(res: int) -> float:
    return _HEX_BASE_EDGE_DEG / (_SQRT7 ** (res - 5))


_Q_OFF = 1 << 26
_R_OFF = 1 << 26


def hex_cell(lon_deg: np.ndarray, lat_deg: np.ndarray, res: int = 9) -> np.ndarray:
    """lon/lat → hex cell id (uint64) at resolution ``res`` (7-12
    nominal; any 0-15 works). Pointy-top axial grid, cube rounding."""
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    s = _hex_size(res)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    q, r = _cube_round(qf, rf)
    return _hex_pack(res, q, r)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _hex_pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.uint64(res) << np.uint64(56))
        | ((q + _Q_OFF).astype(np.uint64) << np.uint64(28))
        | (r + _R_OFF).astype(np.uint64)
    )


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(56)).astype(np.int64)
    q = ((c >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64) - _Q_OFF
    r = (c & np.uint64((1 << 28) - 1)).astype(np.int64) - _R_OFF
    return res, q, r


def hex_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_unpack(cell)
    s = np.array([_hex_size(int(x)) for x in np.atleast_1d(res)])
    y = 1.5 * r * s
    x = _SQRT3 * (q + r / 2.0) * s
    return x, y


_AXIAL_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def hex_k_ring(cell: int, k: int) -> np.ndarray:
    """All hex cells within grid distance k (inclusive) — the H3
    k-ring used for kNN candidate expansion (SURVEY.md §2.3)."""
    res, q0, r0 = hex_unpack(np.array([cell], dtype=np.uint64))
    res, q0, r0 = int(res[0]), int(q0[0]), int(r0[0])
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            qs.append(q0 + dq)
            rs.append(r0 + dr)
    return _hex_pack(res, np.array(qs, dtype=np.int64), np.array(rs, dtype=np.int64))


def hex_k_rings_batch(cells: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-ring for an array of cells.

    Returns (flat_neighbor_cells, offsets) — neighbor count per input
    is the constant 3k(k+1)+1, so offsets are implicit but returned
    for convenience.
    """
    res, q0, r0 = hex_unpack(np.asarray(cells, dtype=np.uint64))
    dq_list, dr_list = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            dq_list.append(dq)
            dr_list.append(dr)
    dq_arr = np.array(dq_list, dtype=np.int64)
    dr_arr = np.array(dr_list, dtype=np.int64)
    m = len(dq_arr)
    q = (q0[:, None] + dq_arr[None, :]).ravel()
    r = (r0[:, None] + dr_arr[None, :]).ravel()
    res_rep = np.repeat(res, m)
    flat = (
        (res_rep.astype(np.uint64) << np.uint64(56))
        | ((q + _Q_OFF).astype(np.uint64) << np.uint64(28))
        | (r + _R_OFF).astype(np.uint64)
    )
    offsets = np.arange(len(cells) + 1, dtype=np.int64) * m
    return flat, offsets


def hex_cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """Hex cells covering a bbox — exact axial-range enumeration with a
    one-cell margin: a guaranteed superset of every cell whose area
    intersects the bbox. (The previous grid-sampling version could skip
    staggered rows, silently dropping containment/chip matches.)"""
    s = _hex_size(res)
    r_lo = int(np.floor((2.0 / 3.0 * miny) / s)) - 1
    r_hi = int(np.ceil((2.0 / 3.0 * maxy) / s)) + 1
    rs = np.arange(r_lo, r_hi + 1, dtype=np.int64)
    q_lo = np.floor(minx / (_SQRT3 * s) - rs / 2.0).astype(np.int64) - 1
    q_hi = np.ceil(maxx / (_SQRT3 * s) - rs / 2.0).astype(np.int64) + 1
    counts = q_hi - q_lo + 1
    total = int(counts.sum())
    r_flat = np.repeat(rs, counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    q_flat = np.repeat(q_lo, counts) + within
    return _hex_pack(res, q_flat, r_flat)


def hex_cover_contains(
    cells: np.ndarray, minx: float, miny: float, maxx: float, maxy: float, res: int
) -> np.ndarray:
    """Vectorized membership test ``cell ∈ hex_cover_bbox(bbox, res)``
    WITHOUT enumerating the cover — O(1) per cell. Must stay
    formula-identical to :func:`hex_cover_bbox` (same margins) so the
    two are interchangeable; used for bboxes whose enumerated cover
    would be unboundedly large."""
    cres, q, r = hex_unpack(np.asarray(cells, dtype=np.uint64))
    s = _hex_size(res)
    r_lo = int(np.floor((2.0 / 3.0 * miny) / s)) - 1
    r_hi = int(np.ceil((2.0 / 3.0 * maxy) / s)) + 1
    q_lo = np.floor(minx / (_SQRT3 * s) - r / 2.0).astype(np.int64) - 1
    q_hi = np.ceil(maxx / (_SQRT3 * s) - r / 2.0).astype(np.int64) + 1
    return (cres == res) & (r >= r_lo) & (r <= r_hi) & (q >= q_lo) & (q <= q_hi)


# --------------------------------------------------------------------------
# map_batches stage: add cell columns to features
# --------------------------------------------------------------------------


def add_cell_columns(batch, resolutions=(7, 8, 9, 10, 11, 12), s2_level_: int = 12):
    """features batch → + hex_r{res} columns (bbox center) + s2 column.

    Vectorized per batch; centers follow the reference's use of the
    feature point/bbox (nodes: the point; ways/relations: bbox center).
    """
    import pyarrow as pa

    minx = batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float64)
    miny = batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float64)
    maxx = batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64)
    maxy = batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64)
    cx = (minx + maxx) * 0.5
    cy = (miny + maxy) * 0.5
    for res in resolutions:
        batch = batch.append_column(f"hex_r{res}", pa.array(hex_cell(cx, cy, res), pa.uint64()))
    batch = batch.append_column("s2", pa.array(s2_cell_id(cx, cy, s2_level_), pa.uint64()))
    return batch
