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

from . import georender, tags as tags_mod
from .osm_area import relation_is_area, way_is_area

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
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return FEATURES_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=FEATURES_SCHEMA)


def _tags_pairs(tag_cell) -> list[tuple[str, str]]:
    return [(t["key"], t["value"]) for t in tag_cell] if tag_cell else []


def _is_nan(v) -> bool:
    return v is None or (isinstance(v, float) and np.isnan(v))


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
            "doc_id": sub.column("doc_id"),
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
        pa.field("doc_id", pa.string()),
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
    tags_py = batch.column("tags").to_pylist()
    refs_py = batch.column("refs").to_pylist()
    is_area = [
        way_is_area(_tags_pairs(tags_py[i]), [int(r) for r in (refs_py[i] or [])]) for i in keep
    ]
    sub = batch.take(pa.array(keep, pa.int64()))
    return pa.table(
        {
            "id": sub.column("id"),
            "refs": sub.column("refs"),
            "is_area": pa.array(is_area, pa.bool_()),
            "ftype": pa.array(ftypes[keep], pa.uint64()),
            "labels": pa.array([labels[i] for i in keep], pa.binary()),
            "doc_id": sub.column("doc_id"),
            "span_idx": sub.column("span_idx"),
        }
    ).cast(PREPARED_WAYS_SCHEMA)


def encode_ways_batch(batch: pa.Table) -> pa.Table:
    """resolved way rows → line/area features (src/lib.rs:222-254).

    Input (from joins.resolve_ways): way_id, node_id_list (refs in
    order), lon_list, lat_list, is_area, ftype, labels, doc_id,
    span_idx.
    """
    ids = batch.column("way_id").to_numpy(zero_copy_only=False)
    dep_ids = batch.column("node_id_list").to_pylist()
    dep_lon = batch.column("lon_list").to_pylist()
    dep_lat = batch.column("lat_list").to_pylist()
    is_area_col = batch.column("is_area").to_pylist()
    ftypes = batch.column("ftype").to_pylist()
    labels = batch.column("labels").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    span_idx = batch.column("span_idx").to_pylist()

    rows = []
    for i in range(len(batch)):
        refs = [int(r) for r in (dep_ids[i] or [])]
        # pdeps: node_id → f32 coord, distinct resolved (src/lib.rs:222-227)
        pdeps: dict[int, tuple[float, float]] = {}
        for nid, lo, la in zip(refs, dep_lon[i] or [], dep_lat[i] or []):
            if _is_nan(lo):
                continue
            pdeps[nid] = (float(np.float32(lo)), float(np.float32(la)))
        if len(pdeps) <= 1:  # degenerate (src/lib.rs:229)
            continue
        coords = np.array(list(pdeps.values()), dtype=np.float32)
        minx, miny = coords.min(axis=0)
        maxx, maxy = coords.max(axis=0)
        is_area = bool(is_area_col[i])
        fid = int(ids[i]) * 3 + 1
        payload, positions, cells = georender.way_from_parsed(
            fid, int(ftypes[i]), is_area, labels[i], refs, pdeps
        )
        if not payload:  # empty-encoding skip (src/lib.rs:242)
            continue
        rows.append(
            {
                "key": fid,
                "ftype": int(ftypes[i]),
                "kind": georender.KIND_AREA if is_area else georender.KIND_LINE,
                "minx": float(minx),
                "miny": float(miny),
                "maxx": float(maxx),
                "maxy": float(maxy),
                "positions": positions,
                "ring_offsets": [0, len(positions) // 2] if is_area else [],
                "cells": cells,
                "labels": labels[i],
                "payload": payload,
                "doc_id": doc_ids[i],
                "span_idx": int(span_idx[i]),
            }
        )
    return _rows_to_table(rows)


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
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)


def prepare_relations_batch(batch: pa.Table) -> pa.Table:
    """Pre-join relation filters (src/lib.rs:320-340): classify, drop
    place.other and non-areas (dropped *entirely*, :325-326), keep only
    Way members with inner/outer roles, drop empty-member relations."""
    ftypes, labels = tags_mod.classify_batch(batch.column("tags"))
    other = tags_mod.place_other()
    tags_py = batch.column("tags").to_pylist()
    members_py = batch.column("members").to_pylist()

    keep_rows, new_members, keep_ftypes, keep_labels = [], [], [], []
    for i in range(len(batch)):
        if ftypes[i] == other:
            continue
        if not relation_is_area(_tags_pairs(tags_py[i])):
            continue
        ms = [
            m
            for m in (members_py[i] or [])
            if m["mtype"] == "way" and m["role"] in ("inner", "outer")
        ]
        if not ms:
            continue
        keep_rows.append(i)
        new_members.append(ms)
        keep_ftypes.append(int(ftypes[i]))
        keep_labels.append(labels[i])
    if not keep_rows:
        return PREPARED_RELATIONS_SCHEMA.empty_table()
    sub = batch.take(pa.array(keep_rows, pa.int64()))
    return pa.table(
        {
            "id": sub.column("id"),
            "members": pa.array(new_members, PREPARED_RELATIONS_SCHEMA.field("members").type),
            "ftype": pa.array(keep_ftypes, pa.uint64()),
            "labels": pa.array(keep_labels, pa.binary()),
            "doc_id": sub.column("doc_id"),
            "span_idx": sub.column("span_idx"),
        }
    ).cast(PREPARED_RELATIONS_SCHEMA)


def encode_relations_batch(batch: pa.Table) -> pa.Table:
    """resolved relation rows → area features (src/lib.rs:342-380).

    Input (from joins.resolve_relations): rel_id, okey_list,
    way_id_list, node_id_list, lon_list, lat_list, inner_list, ftype,
    labels, doc_id, span_idx — rows sorted by (member pos, ref pos).
    """
    ids = batch.column("rel_id").to_numpy(zero_copy_only=False)
    okeys = batch.column("okey_list").to_pylist()
    dep_way = batch.column("way_id_list").to_pylist()
    dep_node = batch.column("node_id_list").to_pylist()
    dep_lon = batch.column("lon_list").to_pylist()
    dep_lat = batch.column("lat_list").to_pylist()
    dep_inner = batch.column("inner_list").to_pylist()
    ftypes = batch.column("ftype").to_pylist()
    labels = batch.column("labels").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    span_idx = batch.column("span_idx").to_pylist()

    rows = []
    for i in range(len(batch)):
        # rebuild member order + way_deps {way_id → ordered refs} +
        # node_deps {nid → f32 coord} (src/lib.rs:342-354)
        way_deps: dict[int, list[int]] = {}
        node_deps: dict[int, tuple[float, float]] = {}
        member_seq: list[tuple[int, str]] = []
        last_mpos = -1
        for ok, wid, nid, lo, la, inner in zip(
            okeys[i] or [],
            dep_way[i] or [],
            dep_node[i] or [],
            dep_lon[i] or [],
            dep_lat[i] or [],
            dep_inner[i] or [],
        ):
            mpos = int(ok) >> 32
            if mpos != last_mpos:
                member_seq.append((int(wid), "inner" if inner else "outer"))
                last_mpos = mpos
            if _is_nan(nid):
                continue  # member way missing from the corpus
            way_deps.setdefault(int(wid), []).append(int(nid))
            if not _is_nan(lo):
                node_deps[int(nid)] = (float(np.float32(lo)), float(np.float32(la)))
        if len(node_deps) <= 1:  # src/lib.rs:356
            continue
        coords = np.array(list(node_deps.values()), dtype=np.float32)
        minx, miny = coords.min(axis=0)
        maxx, maxy = coords.max(axis=0)
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
