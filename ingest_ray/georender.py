"""Georender-style feature payload codec + feature assembly.

Binary layout (self-consistent; mirrors the reference's payload
*semantics* — the decoded feature contract pinned by
/root/reference/tests/ingest.rs:54-87 — while the exact byte grammar is
ours, since the external crate's data files are not copied):

    header:  varint version(=1) | u8 kind (1 pt / 2 line / 3 area)
             | varint feature_type | varint id
    point:   f32 lon | f32 lat
    line:    varint n | n × (f32 lon, f32 lat)
    area:    varint n | n × (f32 lon, f32 lat) | varint n_cells
             | n_cells × varint cell_index
    labels:  raw label bytes (length-prefixed "=name" entries + 0x00)

The id can be recovered from the header by skipping one varint, one
byte, one varint — the same skip pattern the reference relies on
(/root/reference/src/value.rs:27-38).

Feature assembly semantics (all pinned by the golden corpus):

* ids are ``osm_id*3 + {0 node,1 way,2 relation}``
  (/root/reference/src/lib.rs:150,239,365);
* coordinates narrow to float32 at encode time
  (/root/reference/src/lib.rs:150,225,350) — earcut runs on the
  f32-narrowed values (this decides collinearity tie-breaks and hence
  exact cell vectors);
* a closed area ring drops its closing duplicate ref before
  triangulation (golden way 555: 4 refs → 3 positions);
* relations stitch member ways (inner/outer roles only) into rings,
  outer rings first, hole offsets at inner ring starts
  (golden relation 700: holes=[4]).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .geom import earcut
from .util import varint_decode, varint_encode

KIND_POINT = 1
KIND_LINE = 2
KIND_AREA = 3
VERSION = 1


@dataclass
class Feature:
    id: int
    kind: int
    feature_type: int
    positions: list[float] = field(default_factory=list)  # interleaved f32 lon,lat
    cells: list[int] = field(default_factory=list)
    labels: bytes = b"\x00"

    @property
    def point(self) -> tuple[float, float]:
        return (self.positions[0], self.positions[1])


def _encode_header(out: bytearray, kind: int, ftype: int, fid: int) -> None:
    varint_encode(VERSION, out)
    out.append(kind)
    varint_encode(ftype, out)
    varint_encode(fid, out)


def _f32(v: float) -> float:
    return float(np.float32(v))


def encode_point(fid: int, lonlat: tuple[float, float], ftype: int, labels: bytes) -> bytes:
    out = bytearray()
    _encode_header(out, KIND_POINT, ftype, fid)
    out += struct.pack("<ff", _f32(lonlat[0]), _f32(lonlat[1]))
    out += labels
    return bytes(out)


def encode_line(fid: int, ftype: int, positions: list[float], labels: bytes) -> bytes:
    out = bytearray()
    _encode_header(out, KIND_LINE, ftype, fid)
    n = len(positions) // 2
    varint_encode(n, out)
    out += struct.pack(f"<{2 * n}f", *[_f32(p) for p in positions])
    out += labels
    return bytes(out)


def encode_area(
    fid: int, ftype: int, positions: list[float], cells: list[int], labels: bytes
) -> bytes:
    out = bytearray()
    _encode_header(out, KIND_AREA, ftype, fid)
    n = len(positions) // 2
    varint_encode(n, out)
    out += struct.pack(f"<{2 * n}f", *[_f32(p) for p in positions])
    varint_encode(len(cells), out)
    for c in cells:
        varint_encode(c, out)
    out += labels
    return bytes(out)


def varint_encode_vec(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128: uint64 array → (byte matrix (n,10), lengths).

    Row i's varint is ``mat[i, :lens[i]]``."""
    v = np.asarray(vals, dtype=np.uint64).copy()
    n = len(v)
    mat = np.zeros((n, 10), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    for i in range(10):
        if not active.any():
            break
        b = (v & np.uint64(0x7F)).astype(np.uint8)
        v >>= np.uint64(7)
        more = v != 0
        mat[active, i] = np.where(more[active], b[active] | 0x80, b[active])
        lens[active] = i + 1
        active &= more
    return mat, lens


def encode_points_vec(
    fids: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    ftypes: np.ndarray,
    labels: list[bytes],
):
    """Vectorized point payload assembly → (flat uint8 buffer, int32
    offsets) ready for a ``pa.BinaryArray``.

    Same byte grammar as :func:`encode_point` (round-trip tested); no
    per-row Python in the hot path — nodes are the bulk of a planet
    corpus, so this is the encoder that must scale.
    """
    n = len(fids)
    ft_mat, ft_len = varint_encode_vec(ftypes)
    id_mat, id_len = varint_encode_vec(fids)
    lab_len = np.fromiter((len(b) for b in labels), dtype=np.int64, count=n)
    lab_flat = np.frombuffer(b"".join(labels), dtype=np.uint8)

    # layout per row: [ver=1][kind][ftype varint][id varint][8B coords][labels]
    total = 2 + ft_len + id_len + 8 + lab_len
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offs[1:])
    flat = np.empty(offs[-1], dtype=np.uint8)
    start = offs[:-1]
    flat[start] = VERSION
    flat[start + 1] = KIND_POINT

    def scatter(mat_or_flat, lens, dst_start, src_is_matrix=True):
        tot = int(lens.sum())
        if tot == 0:
            return
        first = np.cumsum(lens) - lens
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, lens)
        dst = np.repeat(dst_start, lens) + within
        if src_is_matrix:
            rows = np.repeat(np.arange(n), lens)
            flat[dst] = mat_or_flat[rows, within]
        else:
            flat[dst] = mat_or_flat

    scatter(ft_mat, ft_len, start + 2)
    scatter(id_mat, id_len, start + 2 + ft_len)
    coords = np.empty((n, 2), dtype="<f4")
    coords[:, 0] = lon
    coords[:, 1] = lat
    coord_bytes = coords.view(np.uint8)  # (n, 8)
    scatter(coord_bytes, np.full(n, 8, dtype=np.int64), start + 2 + ft_len + id_len)
    scatter(lab_flat, lab_len, start + 2 + ft_len + id_len + 8, src_is_matrix=False)
    return flat, offs.astype(np.int32)


def _scatter_mat(flat: np.ndarray, dst_start: np.ndarray, mat: np.ndarray, lens: np.ndarray) -> None:
    """Scatter per-row byte rows ``mat[i, :lens[i]]`` into ``flat`` at
    ``dst_start[i]`` (zero-length rows contribute nothing)."""
    tot = int(lens.sum())
    if tot == 0:
        return
    first = np.cumsum(lens) - lens
    within = np.arange(tot, dtype=np.int64) - np.repeat(first, lens)
    dst = np.repeat(dst_start, lens) + within
    rows = np.repeat(np.arange(len(lens)), lens)
    flat[dst] = mat[rows, within]


def _scatter_flat(flat: np.ndarray, dst_start: np.ndarray, lens: np.ndarray, src: np.ndarray) -> None:
    """Scatter a row-grouped flat byte stream (row i owns the next
    ``lens[i]`` bytes of ``src``) into ``flat`` at ``dst_start[i]``."""
    tot = int(lens.sum())
    if tot == 0:
        return
    first = np.cumsum(lens) - lens
    within = np.arange(tot, dtype=np.int64) - np.repeat(first, lens)
    dst = np.repeat(dst_start, lens) + within
    flat[dst] = src[:tot]


def encode_geoms_vec(
    fids: np.ndarray,
    ftypes: np.ndarray,
    kinds: np.ndarray,
    pos_flat: np.ndarray,
    pos_offsets: np.ndarray,
    cells_flat: np.ndarray,
    cells_offsets: np.ndarray,
    lab_flat: np.ndarray,
    lab_lens: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized line/area payload assembly → (flat uint8, int64 offsets).

    Byte grammar identical to :func:`encode_line` / :func:`encode_area`
    (round-trip + differential tested). ``pos_flat`` is interleaved f32
    lon,lat; ``pos_offsets`` are *pair* offsets (len n+1); lines have an
    empty cells segment and omit the cell-count varint entirely;
    ``lab_flat``/``lab_lens`` are concatenated label bytes + per-row
    lengths. No per-row Python — this is the ways analog of
    :func:`encode_points_vec` (the per-row dict/bytearray loop was the
    dominant serial fraction of the encode stage).
    """
    n = len(fids)
    npts = np.diff(pos_offsets).astype(np.int64)
    ft_mat, ft_len = varint_encode_vec(np.asarray(ftypes, dtype=np.uint64))
    id_mat, id_len = varint_encode_vec(np.asarray(fids, dtype=np.uint64))
    np_mat, np_len = varint_encode_vec(npts.astype(np.uint64))
    is_area = kinds == KIND_AREA
    ncells = np.diff(cells_offsets).astype(np.int64)
    nc_mat, nc_len = varint_encode_vec(ncells.astype(np.uint64))
    nc_len = np.where(is_area, nc_len, 0)
    if len(cells_flat):
        c_mat, c_lens = varint_encode_vec(np.asarray(cells_flat, dtype=np.uint64))
        ctot = int(c_lens.sum())
        cfirst = np.cumsum(c_lens) - c_lens
        cwithin = np.arange(ctot, dtype=np.int64) - np.repeat(cfirst, c_lens)
        crows = np.repeat(np.arange(len(c_lens)), c_lens)
        cbytes = c_mat[crows, cwithin]
        ccum = np.concatenate([[0], np.cumsum(c_lens)])
        row_cbytes = (ccum[cells_offsets[1:]] - ccum[cells_offsets[:-1]]).astype(np.int64)
    else:
        cbytes = np.empty(0, dtype=np.uint8)
        row_cbytes = np.zeros(n, dtype=np.int64)
    coord_len = 8 * npts
    lab_lens = np.asarray(lab_lens, dtype=np.int64)
    total = 2 + ft_len + id_len + np_len + coord_len + nc_len + row_cbytes + lab_lens
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offs[1:])
    flat = np.empty(offs[-1], dtype=np.uint8)
    start = offs[:-1]
    flat[start] = VERSION
    flat[start + 1] = kinds
    cursor = start + 2
    _scatter_mat(flat, cursor, ft_mat, ft_len)
    cursor = cursor + ft_len
    _scatter_mat(flat, cursor, id_mat, id_len)
    cursor = cursor + id_len
    _scatter_mat(flat, cursor, np_mat, np_len)
    cursor = cursor + np_len
    coord_bytes = np.ascontiguousarray(pos_flat.astype("<f4", copy=False)).view(np.uint8)
    _scatter_flat(flat, cursor, coord_len, coord_bytes)
    cursor = cursor + coord_len
    _scatter_mat(flat, cursor, nc_mat, nc_len)
    cursor = cursor + nc_len
    _scatter_flat(flat, cursor, row_cbytes, cbytes)
    cursor = cursor + row_cbytes
    _scatter_flat(flat, cursor, lab_lens, lab_flat)
    return flat, offs


def decode(buf: bytes) -> Feature:
    version, off = varint_decode(buf, 0)
    if version != VERSION:
        raise ValueError(f"unknown georender version {version}")
    kind = buf[off]
    off += 1
    ftype, off = varint_decode(buf, off)
    fid, off = varint_decode(buf, off)
    if kind == KIND_POINT:
        lon, lat = struct.unpack_from("<ff", buf, off)
        off += 8
        return Feature(fid, kind, ftype, [lon, lat], [], bytes(buf[off:]))
    n, off = varint_decode(buf, off)
    positions = list(struct.unpack_from(f"<{2 * n}f", buf, off))
    off += 8 * n
    if kind == KIND_LINE:
        return Feature(fid, kind, ftype, positions, [], bytes(buf[off:]))
    if kind == KIND_AREA:
        n_cells, off = varint_decode(buf, off)
        cells = []
        for _ in range(n_cells):
            c, off = varint_decode(buf, off)
            cells.append(c)
        return Feature(fid, kind, ftype, positions, cells, bytes(buf[off:]))
    raise ValueError(f"unknown kind {kind}")


def payload_id(buf: bytes) -> int:
    """Recover the feature id from header bytes only — the skip pattern
    of /root/reference/src/value.rs:27-38 (varint, byte, varint, varint)."""
    _, off = varint_decode(buf, 0)
    off += 1
    _, off = varint_decode(buf, off)
    fid, _ = varint_decode(buf, off)
    return fid


# --------------------------------------------------------------------------
# feature assembly (the encode::*_from_parsed analogs)
# --------------------------------------------------------------------------


def node_from_parsed(fid: int, lonlat: tuple[float, float], ftype: int, labels: bytes) -> bytes:
    """Analog of georender encode::node_from_parsed as called at
    /root/reference/src/lib.rs:149-153."""
    return encode_point(fid, lonlat, ftype, labels)


def way_from_parsed(
    fid: int,
    ftype: int,
    is_area: bool,
    labels: bytes,
    refs: list[int],
    pdeps: dict[int, tuple[float, float]],
) -> tuple[bytes, list[float], list[int]]:
    """Analog of encode::way_from_parsed (/root/reference/src/lib.rs:238-247).

    Returns (payload, f32 positions, earcut cells) — positions/cells
    also feed the features table columns for PIP/tiling.
    """
    use_refs = list(refs)
    if is_area and len(use_refs) > 1 and use_refs[0] == use_refs[-1]:
        use_refs = use_refs[:-1]  # closing duplicate not emitted (golden way 555)
    positions: list[float] = []
    for r in use_refs:
        p = pdeps.get(r)
        if p is not None:
            positions.append(_f32(p[0]))
            positions.append(_f32(p[1]))
    if not positions:
        return b"", [], []
    if is_area:
        cells = earcut(positions, [], 2)
        return encode_area(fid, ftype, positions, cells, labels), positions, cells
    return encode_line(fid, ftype, positions, labels), positions, []


def assemble_rings(
    members: list[tuple[int, str]],
    way_deps: dict[int, list[int]],
) -> tuple[list[tuple[str, list[int]]], bool]:
    """Stitch member ways (in member order) into closed rings.

    ``members`` are (way_id, role) with role ∈ {outer, inner} (already
    filtered per /root/reference/src/lib.rs:327-339). Consecutive ways
    sharing endpoints are chained (reversing when needed). Returns
    ([(role, node_ids-without-closing-dup)], all_closed).
    """
    rings: list[tuple[str, list[int]]] = []
    current: list[int] = []
    current_role = ""
    all_closed = True

    def finish(ring: list[int], role: str):
        nonlocal all_closed
        if len(ring) > 1 and ring[0] == ring[-1]:
            ring = ring[:-1]
        else:
            all_closed = False
        if ring:
            rings.append((role, ring))

    for way_id, role in members:
        refs = way_deps.get(way_id)
        if not refs:
            continue
        refs = list(refs)
        if not current:
            current, current_role = refs, role
        elif role == current_role and current[-1] == refs[0]:
            current += refs[1:]
        elif role == current_role and current[-1] == refs[-1]:
            current += list(reversed(refs[:-1]))
        elif role == current_role and current[0] == refs[-1]:
            current = refs[:-1] + current
        elif role == current_role and current[0] == refs[0]:
            current = list(reversed(refs))[:-1] + current
        else:
            finish(current, current_role)
            current, current_role = refs, role
        if len(current) > 1 and current[0] == current[-1]:
            finish(current, current_role)
            current = []
    if current:
        finish(current, current_role)
    return rings, all_closed


def relation_from_parsed(
    fid: int,
    ftype: int,
    labels: bytes,
    members: list[tuple[int, str]],
    node_deps: dict[int, tuple[float, float]],
    way_deps: dict[int, list[int]],
) -> tuple[bytes, list[float], list[int], list[int]]:
    """Analog of encode::relation_from_parsed
    (/root/reference/src/lib.rs:364-373): multipolygon assembly with
    earcut hole indices (golden relation 700 pins cells + holes=[4]).

    Returns (payload, positions, cells, ring_offsets_in_points).
    """
    rings, _ = assemble_rings(members, way_deps)
    outers = [r for r in rings if r[0] == "outer"]
    inners = [r for r in rings if r[0] == "inner"]
    positions: list[float] = []
    holes: list[int] = []
    ring_offsets: list[int] = [0]
    for group, is_hole in ((outers, False), (inners, True)):
        for _role, node_ids in group:
            pts: list[float] = []
            for nid in node_ids:
                p = node_deps.get(nid)
                if p is not None:
                    pts.append(_f32(p[0]))
                    pts.append(_f32(p[1]))
            if not pts:
                continue
            if is_hole:
                holes.append(len(positions) // 2)
            positions += pts
            ring_offsets.append(len(positions) // 2)
    if not positions:
        return b"", [], [], []
    cells = earcut(positions, holes, 2)
    return encode_area(fid, ftype, positions, cells, labels), positions, cells, ring_offsets
