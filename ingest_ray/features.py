"""Element preparation + georender feature encoding (map_batches bodies).

Filter/encode semantics follow the reference exactly:

* nodes  — /root/reference/src/lib.rs:142-160 (tag classify, drop
  place.other, f32 narrow, empty-encoding skip);
* ways   — src/lib.rs:215-254 (≤1 resolved dep skip, f32 bbox fold over
  *distinct resolved* nodes, osm_is_area, closing-dup ring drop);
* relations — src/lib.rs:318-380 (area-only, Way+inner/outer member
  filter, two-hop deps, distinct-node bbox).

Feature ids are ``osm_id*3+{0,1,2}`` (src/lib.rs:150,239,365). All
feature geometry is float32 (src/lib.rs:150,225,350).

The prepare_* stages run BEFORE the join shuffles (classify + filter +
is_area there), so dropped elements never enter an exchange and the
shuffle carries compact scalar meta instead of tag structs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import geom, georender, tags as tags_mod
from .elements import DOC_ID_TYPE
from .osm_area import relations_are_area_vec, ways_are_area_vec

FEATURES_SCHEMA = pa.schema(
    [
        pa.field("key", pa.uint64()),
        pa.field("ftype", pa.uint64()),
        pa.field("kind", pa.uint8()),  # 1 point / 2 line / 3 area
        pa.field("minx", pa.float32()),
        pa.field("miny", pa.float32()),
        pa.field("maxx", pa.float32()),
        pa.field("maxy", pa.float32()),
        pa.field("positions", pa.list_(pa.float32())),
        pa.field("ring_offsets", pa.list_(pa.int32())),
        pa.field("cells", pa.list_(pa.int32())),
        pa.field("labels", pa.binary()),
        pa.field("payload", pa.binary()),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)



def _compact_doc(col) -> pa.Array:
    """Re-encode a filtered/taken dictionary column: take/filter keep
    the ancestral block's FULL dictionary, which can dwarf the
    surviving indices (measured 34 B/row vs 4 on encode output) —
    rebuild it over the referenced values only."""
    import pyarrow.compute as pc

    col = _combine(col)
    return pc.dictionary_encode(col.cast(pa.string()))

def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return FEATURES_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=FEATURES_SCHEMA)


def _tags_pairs(tag_cell) -> list[tuple[str, str]]:
    return [(t["key"], t["value"]) for t in tag_cell] if tag_cell else []


def _is_nan(v) -> bool:
    return v is None or (isinstance(v, float) and np.isnan(v))


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _col_np(batch: pa.Table, name: str) -> np.ndarray:
    return _combine(batch.column(name)).to_numpy(zero_copy_only=False)


def _list_col(batch: pa.Table, name: str) -> tuple[np.ndarray, pa.Array]:
    """(0-based int64 offsets, flat values) of a list column — sliced
    arrays keep parent offsets, so rebase (same contract as
    joins._list_offsets)."""
    col = _combine(batch.column(name))
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return off - off[0], col.flatten()


def _binary_flat(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Binary array → (row-grouped flat uint8 stream, per-row lengths)."""
    arr = _combine(arr)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    return data[offs[0] : offs[-1]], np.diff(offs).astype(np.int64)


# --------------------------------------------------------------------------
# nodes
# --------------------------------------------------------------------------


def encode_nodes_batch(batch: pa.Table) -> pa.Table:
    """nodes → point features (src/lib.rs:142-160).

    Fully vectorized: classification touches only tagged rows, payloads
    assemble through the batched varint/scatter encoder
    (georender.encode_points_vec) — nodes are the bulk of a planet
    corpus, so this stage has no per-row Python.
    """
    ftypes, labels = tags_mod.classify_batch(batch.column("tags"))
    other = tags_mod.place_other()
    keep = np.flatnonzero(ftypes != other)
    if len(keep) == 0:
        return FEATURES_SCHEMA.empty_table()
    sub = batch.take(pa.array(keep, pa.int64()))
    ids = sub.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    lon = sub.column("lon").to_numpy(zero_copy_only=False).astype(np.float32)
    lat = sub.column("lat").to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(keep)
    fids = (ids * 3).astype(np.uint64)
    kept_ftypes = ftypes[keep]
    kept_labels = [labels[i] for i in keep]

    pay_flat, pay_offs = georender.encode_points_vec(fids, lon, lat, kept_ftypes, kept_labels)
    payload = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(pay_offs), pa.py_buffer(pay_flat)]
    )
    lab_flat = np.frombuffer(b"".join(kept_labels), dtype=np.uint8)
    lab_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum([len(b) for b in kept_labels], out=lab_offs[1:])
    labels_arr = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(lab_offs), pa.py_buffer(lab_flat)]
    )
    pos_flat = np.empty(2 * n, dtype=np.float32)
    pos_flat[0::2] = lon
    pos_flat[1::2] = lat
    pos_offs = pa.array(np.arange(0, 2 * n + 2, 2, dtype=np.int64).astype(np.int32), pa.int32())
    empty_offs = pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32())
    return pa.table(
        {
            "key": pa.array(fids, pa.uint64()),
            "ftype": pa.array(kept_ftypes, pa.uint64()),
            "kind": pa.array(np.full(n, georender.KIND_POINT, dtype=np.uint8), pa.uint8()),
            "minx": pa.array(lon, pa.float32()),
            "miny": pa.array(lat, pa.float32()),
            "maxx": pa.array(lon, pa.float32()),
            "maxy": pa.array(lat, pa.float32()),
            "positions": pa.ListArray.from_arrays(pos_offs, pa.array(pos_flat, pa.float32())),
            "ring_offsets": pa.ListArray.from_arrays(empty_offs, pa.array([], pa.int32())),
            "cells": pa.ListArray.from_arrays(empty_offs, pa.array([], pa.int32())),
            "labels": labels_arr,
            "payload": payload,
            "doc_id": _compact_doc(sub.column("doc_id")),
            "span_idx": sub.column("span_idx"),
        }
    ).cast(FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# ways
# --------------------------------------------------------------------------

PREPARED_WAYS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field("is_area", pa.bool_()),
        pa.field("ftype", pa.uint64()),
        pa.field("labels", pa.binary()),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)


def prepare_ways_batch(batch: pa.Table) -> pa.Table:
    """classify + place.other filter + is_area, before the join
    (src/lib.rs:216-221,236-237; pruning pre-shuffle is our change —
    same output, less exchange)."""
    ftypes, labels = tags_mod.classify_batch(batch.column("tags"))
    other = tags_mod.place_other()
    keep = np.flatnonzero(ftypes != other)
    if len(keep) == 0:
        return PREPARED_WAYS_SCHEMA.empty_table()
    ref_offs, ref_flat = _list_col(batch, "refs")
    refs_np = np.asarray(ref_flat.to_numpy(zero_copy_only=False), dtype=np.int64)
    is_area_all = ways_are_area_vec(_combine(batch.column("tags")), ref_offs, refs_np)
    sub = batch.take(pa.array(keep, pa.int64()))
    return pa.table(
        {
            "id": sub.column("id"),
            "refs": sub.column("refs"),
            "is_area": pa.array(is_area_all[keep], pa.bool_()),
            "ftype": pa.array(ftypes[keep], pa.uint64()),
            "labels": pa.array([labels[i] for i in keep], pa.binary()),
            "doc_id": _compact_doc(sub.column("doc_id")),
            "span_idx": sub.column("span_idx"),
        }
    ).cast(PREPARED_WAYS_SCHEMA)


def encode_ways_batch(batch: pa.Table) -> pa.Table:
    """resolved way rows → line/area features (src/lib.rs:222-254).

    Input (from joins.resolve_ways): way_id, node_id_list (refs in
    order), lon_list, lat_list, is_area, ftype, labels, doc_id,
    span_idx.

    Fully vectorized (differentially tested byte-identical to the
    per-row reference loop): degenerate/empty filters, f32 bbox folds,
    closing-duplicate drop and payload assembly all run as flat numpy
    passes over the Arrow list offsets; the only per-row Python left is
    the earcut call for area ways.
    """
    n = batch.num_rows
    if n == 0:
        return FEATURES_SCHEMA.empty_table()
    offs, ref_arr = _list_col(batch, "node_id_list")
    _, lon_arr = _list_col(batch, "lon_list")
    _, lat_arr = _list_col(batch, "lat_list")
    refs = np.asarray(ref_arr.to_numpy(zero_copy_only=False))
    if refs.dtype.kind == "f":  # nulls → NaN (never matches a node id)
        refs = np.where(np.isnan(refs), np.int64(-(2**62)), refs).astype(np.int64)
    else:
        refs = refs.astype(np.int64, copy=False)
    lon = np.asarray(lon_arr.to_numpy(zero_copy_only=False))
    lat = np.asarray(lat_arr.to_numpy(zero_copy_only=False))
    resolved = ~np.isnan(lon)
    counts = np.diff(offs)
    row_of = np.repeat(np.arange(n), counts)

    # degenerate filter: >1 DISTINCT resolved node id (src/lib.rs:229)
    rr = row_of[resolved]
    if len(rr):
        rf = refs[resolved]
        order = np.lexsort((rf, rr))
        sr = rr[order]
        sf = rf[order]
        new = np.empty(len(sr), dtype=bool)
        new[0] = True
        new[1:] = (sr[1:] != sr[:-1]) | (sf[1:] != sf[:-1])
        distinct = np.bincount(sr[new], minlength=n)
    else:
        distinct = np.zeros(n, dtype=np.int64)
    keep = distinct > 1

    is_area = np.asarray(_col_np(batch, "is_area"), dtype=bool)
    # area closing-duplicate ref drop (golden way 555; src ring semantics)
    closing = np.zeros(n, dtype=bool)
    m2 = is_area & (counts > 1)
    closing[m2] = refs[offs[:-1][m2]] == refs[(offs[1:] - 1)[m2]]
    drop = np.zeros(len(refs), dtype=bool)
    drop[(offs[1:] - 1)[closing]] = True

    emit = resolved & ~drop & keep[row_of]
    npts_all = np.bincount(row_of[emit], minlength=n)
    keep &= npts_all > 0  # empty-encoding skip (src/lib.rs:242)
    emit &= keep[row_of]
    kept = np.flatnonzero(keep)
    m = len(kept)
    if m == 0:
        return FEATURES_SCHEMA.empty_table()

    lon32 = lon.astype(np.float32, copy=False)
    lat32 = lat.astype(np.float32, copy=False)
    npts_k = npts_all[kept].astype(np.int64)
    pos_offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(npts_k, out=pos_offs[1:])
    pos_flat = np.empty(2 * int(pos_offs[-1]), dtype=np.float32)
    pos_flat[0::2] = lon32[emit]
    pos_flat[1::2] = lat32[emit]
    # bbox over emitted f32 coords == bbox over distinct resolved coords:
    # the only non-emitted resolved entry is the closing duplicate, whose
    # coord equals the first ring coord (src/lib.rs:228-235 semantics)
    bbox = geom.bbox_reduceat(pos_flat, pos_offs)

    area_k = is_area[kept]
    ids = np.asarray(_col_np(batch, "way_id"), dtype=np.int64)
    fids = (ids[kept] * 3 + 1).astype(np.uint64)
    kinds = np.where(area_k, georender.KIND_AREA, georender.KIND_LINE).astype(np.uint8)
    ftypes_k = np.asarray(_col_np(batch, "ftype"), dtype=np.uint64)[kept]

    cell_counts = np.zeros(m, dtype=np.int64)
    cells_parts: list[list[int]] = []
    for j in np.flatnonzero(area_k):
        s = 2 * int(pos_offs[j])
        e = 2 * int(pos_offs[j + 1])
        c = geom.earcut(pos_flat[s:e].tolist(), [], 2)
        cells_parts.append(c)
        cell_counts[j] = len(c)
    cells_offsets = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(cell_counts, out=cells_offsets[1:])
    if cells_parts:
        cells_flat = np.fromiter(
            (v for c in cells_parts for v in c), dtype=np.int64, count=int(cells_offsets[-1])
        )
    else:
        cells_flat = np.empty(0, dtype=np.int64)

    lab_k = _combine(batch.column("labels")).take(pa.array(kept, pa.int64()))
    lab_flat, lab_lens = _binary_flat(lab_k)
    pay_flat, pay_offs = georender.encode_geoms_vec(
        fids, ftypes_k, kinds, pos_flat, pos_offs, cells_flat, cells_offsets, lab_flat, lab_lens
    )
    payload = pa.Array.from_buffers(
        pa.binary(),
        m,
        [None, pa.py_buffer(pay_offs.astype(np.int32)), pa.py_buffer(pay_flat)],
    )
    rcounts = np.where(area_k, 2, 0).astype(np.int64)
    roffs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(rcounts, out=roffs[1:])
    rflat = np.empty(int(roffs[-1]), dtype=np.int32)
    rflat[0::2] = 0
    rflat[1::2] = npts_k[area_k]

    kept_arr = pa.array(kept, pa.int64())
    return pa.table(
        {
            "key": pa.array(fids, pa.uint64()),
            "ftype": pa.array(ftypes_k, pa.uint64()),
            "kind": pa.array(kinds, pa.uint8()),
            "minx": pa.array(bbox[:, 0], pa.float32()),
            "miny": pa.array(bbox[:, 1], pa.float32()),
            "maxx": pa.array(bbox[:, 2], pa.float32()),
            "maxy": pa.array(bbox[:, 3], pa.float32()),
            "positions": pa.ListArray.from_arrays(
                pa.array((2 * pos_offs).astype(np.int32), pa.int32()),
                pa.array(pos_flat, pa.float32()),
            ),
            "ring_offsets": pa.ListArray.from_arrays(
                pa.array(roffs.astype(np.int32), pa.int32()), pa.array(rflat, pa.int32())
            ),
            "cells": pa.ListArray.from_arrays(
                pa.array(cells_offsets.astype(np.int32), pa.int32()),
                pa.array(cells_flat.astype(np.int32), pa.int32()),
            ),
            "labels": lab_k,
            "payload": payload,
            "doc_id": _compact_doc(_combine(batch.column("doc_id")).take(kept_arr)),
            "span_idx": _combine(batch.column("span_idx")).take(kept_arr),
        }
    ).cast(FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# fused all-kinds encoder (broadcast mode)
# --------------------------------------------------------------------------


def encode_all_batch(batch: pa.Table, node_idx_ref, way_idx_ref) -> pa.Table:
    """One union-elements batch → features for every kind, in place.

    The broadcast-mode pipeline collapses to elements →
    ``map_batches(encode_all)`` — one operator, zero shuffles: node
    encode + in-batch way/relation resolution (joins.resolve_*_batch)
    + encode, concatenated. Each extra Dataset execution costs ~1-2s
    of fixed overhead, which dominated small-cluster wall time when
    the three kinds ran as separate branch executions.
    """
    import pyarrow.compute as pc
    import ray

    from . import joins
    from .elements import kind_view  # noqa: F401  (schema origin documented there)

    parts = []
    ek = batch.column("ekind")
    nodes = batch.filter(pc.equal(ek, 0))
    if len(nodes):
        parts.append(encode_nodes_batch(nodes))
    ways = batch.filter(pc.equal(ek, 1))
    if len(ways):
        prepared = prepare_ways_batch(ways)
        if len(prepared):
            resolved = joins.resolve_ways_batch(prepared, ray.get(node_idx_ref))
            parts.append(encode_ways_batch(resolved))
    rels = batch.filter(pc.equal(ek, 2))
    if len(rels):
        prepared_r = prepare_relations_batch(rels)
        if len(prepared_r):
            resolved_r = joins.resolve_relations_batch(
                prepared_r, ray.get(way_idx_ref), ray.get(node_idx_ref)
            )
            parts.append(encode_relations_batch(resolved_r))
    if not parts:
        return FEATURES_SCHEMA.empty_table()
    return pa.concat_tables(parts)


# --------------------------------------------------------------------------
# relations
# --------------------------------------------------------------------------

PREPARED_RELATIONS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field(
            "members",
            pa.list_(
                pa.struct(
                    [
                        pa.field("ref", pa.int64()),
                        pa.field("mtype", pa.string()),
                        pa.field("role", pa.string()),
                    ]
                )
            ),
        ),
        pa.field("ftype", pa.uint64()),
        pa.field("labels", pa.binary()),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)


def prepare_relations_batch(batch: pa.Table) -> pa.Table:
    """Pre-join relation filters (src/lib.rs:320-340): classify, drop
    place.other and non-areas (dropped *entirely*, :325-326), keep only
    Way members with inner/outer roles, drop empty-member relations."""
    import pyarrow.compute as pc

    n = len(batch)
    if n == 0:
        return PREPARED_RELATIONS_SCHEMA.empty_table()
    ftypes, labels = tags_mod.classify_batch(batch.column("tags"))
    other = tags_mod.place_other()
    keep0 = (ftypes != other) & relations_are_area_vec(_combine(batch.column("tags")))

    members = _combine(batch.column("members"))
    moffs = members.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    moffs = moffs - moffs[0]
    mflat = members.flatten()
    row_of = np.repeat(np.arange(n), np.diff(moffs))
    good = pc.and_(
        pc.equal(mflat.field("mtype"), "way"),
        pc.is_in(mflat.field("role"), value_set=pa.array(["inner", "outer"])),
    )
    good = np.asarray(good.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)
    sel = good & keep0[row_of]
    new_counts = np.bincount(row_of[sel], minlength=n)
    keep = keep0 & (new_counts > 0)
    sel &= keep[row_of]
    kept = np.flatnonzero(keep)
    if len(kept) == 0:
        return PREPARED_RELATIONS_SCHEMA.empty_table()
    new_offs = np.zeros(len(kept) + 1, dtype=np.int64)
    np.cumsum(new_counts[kept], out=new_offs[1:])
    new_members = pa.ListArray.from_arrays(
        pa.array(new_offs.astype(np.int32), pa.int32()),
        mflat.take(pa.array(np.flatnonzero(sel), pa.int64())),
    )
    kept_arr = pa.array(kept, pa.int64())
    return pa.table(
        {
            "id": _combine(batch.column("id")).take(kept_arr),
            "members": new_members,
            "ftype": pa.array(ftypes[kept], pa.uint64()),
            "labels": pa.array([labels[i] for i in kept], pa.binary()),
            "doc_id": _compact_doc(_combine(batch.column("doc_id")).take(kept_arr)),
            "span_idx": _combine(batch.column("span_idx")).take(kept_arr),
        }
    ).cast(PREPARED_RELATIONS_SCHEMA)


def encode_relations_batch(batch: pa.Table) -> pa.Table:
    """resolved relation rows → area features (src/lib.rs:342-380).

    Input (from joins.resolve_relations): rel_id, okey_list,
    way_id_list, node_id_list, lon_list, lat_list, inner_list, ftype,
    labels, doc_id, span_idx — rows sorted by (member pos, ref pos).
    """
    n = batch.num_rows
    if n == 0:
        return FEATURES_SCHEMA.empty_table()
    ids = np.asarray(_col_np(batch, "rel_id"), dtype=np.int64)
    offs, ok_arr = _list_col(batch, "okey_list")
    _, wid_arr = _list_col(batch, "way_id_list")
    _, nid_arr = _list_col(batch, "node_id_list")
    _, lon_arr = _list_col(batch, "lon_list")
    _, lat_arr = _list_col(batch, "lat_list")
    _, inner_arr = _list_col(batch, "inner_list")
    ok = np.asarray(ok_arr.to_numpy(zero_copy_only=False)).astype(np.int64, copy=False)
    wid = np.asarray(wid_arr.to_numpy(zero_copy_only=False)).astype(np.int64, copy=False)
    nid_raw = np.asarray(nid_arr.to_numpy(zero_copy_only=False))
    if nid_raw.dtype.kind == "f":  # nulls (missing member way) → NaN
        nid_valid = ~np.isnan(nid_raw)
        nid = np.where(nid_valid, nid_raw, 0).astype(np.int64)
    else:
        nid = nid_raw.astype(np.int64, copy=False)
        nid_valid = np.ones(len(nid), dtype=bool)
    lon = np.asarray(lon_arr.to_numpy(zero_copy_only=False))
    lat = np.asarray(lat_arr.to_numpy(zero_copy_only=False))
    lon_valid = ~np.isnan(lon)
    lon32 = lon.astype(np.float32, copy=False)
    lat32 = lat.astype(np.float32, copy=False)
    inner = np.asarray(inner_arr.to_numpy(zero_copy_only=False)).astype(bool)
    counts = np.diff(offs)
    row_of = np.repeat(np.arange(n), counts)
    mpos = ok >> 32
    total = int(offs[-1])
    if total:
        is_mstart = np.empty(total, dtype=bool)
        is_mstart[0] = True
        is_mstart[1:] = (row_of[1:] != row_of[:-1]) | (mpos[1:] != mpos[:-1])
        mstart_idx = np.flatnonzero(is_mstart)
    else:
        mstart_idx = np.empty(0, dtype=np.int64)

    ftypes = _col_np(batch, "ftype")
    labels = batch.column("labels").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    span_idx = batch.column("span_idx").to_pylist()
    nid_l = nid.tolist()
    wid_l = wid.tolist()

    rows = []
    for i in range(n):
        # rebuild member order + way_deps {way_id → ordered refs} +
        # node_deps {nid → f32 coord} (src/lib.rs:342-354) from numpy
        # slices — member-granular Python, not ref-granular
        s = int(offs[i])
        e = int(offs[i + 1])
        vmask = lon_valid[s:e]
        if not vmask.any():
            continue
        vn = nid[s:e][vmask]
        node_deps = dict(
            zip(vn.tolist(), zip(lon32[s:e][vmask].tolist(), lat32[s:e][vmask].tolist()))
        )
        if len(node_deps) <= 1:  # src/lib.rs:356
            continue
        sub_lon = lon32[s:e][vmask]
        sub_lat = lat32[s:e][vmask]
        minx, miny = sub_lon.min(), sub_lat.min()
        maxx, maxy = sub_lon.max(), sub_lat.max()

        a = int(np.searchsorted(mstart_idx, s))
        b = int(np.searchsorted(mstart_idx, e))
        bounds = mstart_idx[a:b]
        member_seq: list[tuple[int, str]] = []
        way_deps: dict[int, list[int]] = {}
        for k in range(len(bounds)):
            ms = int(bounds[k])
            me = int(bounds[k + 1]) if k + 1 < len(bounds) else e
            w = wid_l[ms]
            member_seq.append((w, "inner" if inner[ms] else "outer"))
            vm = nid_valid[ms:me]
            refs_m = nid_l[ms:me] if vm.all() else nid[ms:me][vm].tolist()
            if refs_m:
                way_deps.setdefault(w, []).extend(refs_m)
        fid = int(ids[i]) * 3 + 2
        payload, positions, cells, ring_offsets = georender.relation_from_parsed(
            fid, int(ftypes[i]), labels[i], member_seq, node_deps, way_deps
        )
        if not payload:
            continue
        rows.append(
            {
                "key": fid,
                "ftype": int(ftypes[i]),
                "kind": georender.KIND_AREA,
                "minx": float(minx),
                "miny": float(miny),
                "maxx": float(maxx),
                "maxy": float(maxy),
                "positions": positions,
                "ring_offsets": ring_offsets,
                "cells": cells,
                "labels": labels[i],
                "payload": payload,
                "doc_id": doc_ids[i],
                "span_idx": int(span_idx[i]),
            }
        )
    return _rows_to_table(rows)
