"""documents → element tables (nodes / ways / relations).

Ray-Data-first version of the reference's blob decode + element
chunking (/root/reference/src/denorm.rs:43-57): a ``map_batches`` span
parser per element kind instead of blob readers feeding channels. Each
branch prunes to its own kind *before* parsing, so total parse work
across the three branches equals one full pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .spans import explode_spans, parse_geo_span

TAGS_TYPE = pa.list_(pa.struct([pa.field("key", pa.string()), pa.field("value", pa.string())]))

# doc_id rides every element and every feature row; a corpus document
# yields tens of elements, so dictionary encoding cuts the column from
# ~14 B/row (string + offset) to ~4 B/row of the hottest table in the
# pipeline (measured 27% of element-table bytes at bench shape). Tile
# writes decay it back to plain string for canonical output bytes
# (checkpoint._canon_type).
DOC_ID_TYPE = pa.dictionary(pa.int32(), pa.string())

NODES_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("lon", pa.float32()),
        pa.field("lat", pa.float32()),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)

WAYS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)

MEMBERS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("ref", pa.int64()),
            pa.field("mtype", pa.string()),
            pa.field("role", pa.string()),
        ]
    )
)

RELATIONS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("members", MEMBERS_TYPE),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)


def _tags_to_arrow(tag_lists: list[list[tuple[str, str]]]) -> pa.Array:
    return pa.array(
        [[{"key": k, "value": v} for k, v in tags] for tags in tag_lists], type=TAGS_TYPE
    )


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _field_after(col: pa.Array, prefix: str) -> pa.Array:
    """'k=v' string column → 'v' (fixed-width prefix strip)."""
    return pc.utf8_slice_codeunits(col, len(prefix))


def _parse_tags_column(tags_str: pa.Array) -> pa.Array:
    """'k=v;k=v' column → TAGS_TYPE list column.

    Empty strings (the common case — ~90% of synthetic elements are
    untagged) cost nothing; only non-empty cells hit Python.
    """
    py = tags_str.to_pylist()
    out: list[list[dict]] = []
    for s in py:
        if not s:
            out.append([])
        else:
            cells = []
            for part in s.split(";"):
                k, _, v = part.partition("=")
                cells.append({"key": k, "value": v})
            out.append(cells)
    return pa.array(out, type=TAGS_TYPE)


def _split_list_cast(col: pa.Array, sep: str, caster) -> pa.Array:
    """Vectorized 'a,b,c' column → list column via ``caster`` on the
    flat values; empty strings become empty lists."""
    parts = _combine(pc.split_pattern(col, sep))
    raw_off = parts.offsets.to_numpy(zero_copy_only=False)
    off = (raw_off - raw_off[0]).astype(np.int64)
    flat = parts.flatten()
    counts = np.diff(off)
    empty = np.asarray(pc.equal(col, "").to_numpy(zero_copy_only=False))
    if empty.any():
        keep = np.repeat(~empty, counts)
        flat = flat.filter(pa.array(keep))
        counts = np.where(empty, 0, counts)
        off = np.concatenate([[0], np.cumsum(counts)])
    return pa.ListArray.from_arrays(pa.array(off, pa.int32()), caster(flat))


def parse_kind_batch(batch: pa.Table, kind: str) -> pa.Table:
    """One documents batch → element table of a single kind.

    Vectorized over the pipe-delimited span grammar: one
    ``split_pattern`` per batch + fixed-prefix slices + arrow casts.
    Python touches only tag strings of tagged elements (~10%). The
    per-row reference parser (``spans.parse_geo_span``) stays as the
    conformance oracle for this code (tested equal).
    """
    spans = explode_spans(batch)
    mask = pc.equal(spans.column("kind"), kind)
    spans = spans.filter(mask)
    texts = _combine(spans.column("text"))
    doc_ids = spans.column("doc_id")
    span_idx = spans.column("span_idx")
    n = len(texts)
    if n == 0:
        return {"node": NODES_SCHEMA, "way": WAYS_SCHEMA, "relation": RELATIONS_SCHEMA}[
            kind
        ].empty_table()

    parts = _combine(pc.split_pattern(texts, "|"))
    ids = pc.cast(_field_after(_combine(pc.list_element(parts, 1)), "id="), pa.int64())

    if kind == "node":
        # f64 parse then f32 narrowing: every consumer (encoders, joins,
        # bbox folds) casts to f32 before arithmetic, so carrying f32 from
        # the parse is bit-identical downstream while halving exchange
        # bytes and node-index memory (reference stores f32 coords too,
        # src/lib.rs:150,225,350)
        lon = pc.cast(
            pc.cast(_field_after(_combine(pc.list_element(parts, 2)), "lon="), pa.float64()),
            pa.float32(),
        )
        lat = pc.cast(
            pc.cast(_field_after(_combine(pc.list_element(parts, 3)), "lat="), pa.float64()),
            pa.float32(),
        )
        tags = _parse_tags_column(_field_after(_combine(pc.list_element(parts, 4)), "tags="))
        return pa.table(
            {
                "id": ids,
                "lon": lon,
                "lat": lat,
                "tags": tags,
                "doc_id": doc_ids,
                "span_idx": span_idx,
            }
        ).cast(NODES_SCHEMA)

    if kind == "way":
        refs_str = _field_after(_combine(pc.list_element(parts, 2)), "refs=")
        refs = _split_list_cast(refs_str, ",", lambda f: pc.cast(f, pa.int64()))
        tags = _parse_tags_column(_field_after(_combine(pc.list_element(parts, 3)), "tags="))
        return pa.table(
            {
                "id": ids,
                "refs": refs,
                "tags": tags,
                "doc_id": doc_ids,
                "span_idx": span_idx,
            }
        ).cast(WAYS_SCHEMA)

    if kind == "relation":

        def member_caster(flat: pa.Array) -> pa.Array:
            # 'way:outer:600' triplets → struct(ref, mtype, role)
            trip = _combine(pc.split_pattern(flat, ":"))
            mtype = _combine(pc.list_element(trip, 0))
            role = _combine(pc.list_element(trip, 1))
            ref = pc.cast(_combine(pc.list_element(trip, 2)), pa.int64())
            return pa.StructArray.from_arrays([ref, mtype, role], names=["ref", "mtype", "role"])

        members_str = _field_after(_combine(pc.list_element(parts, 2)), "members=")
        members = _split_list_cast(members_str, ",", member_caster)
        tags = _parse_tags_column(_field_after(_combine(pc.list_element(parts, 3)), "tags="))
        return pa.table(
            {
                "id": ids,
                "members": members,
                "tags": tags,
                "doc_id": doc_ids,
                "span_idx": span_idx,
            }
        ).cast(RELATIONS_SCHEMA)
    raise ValueError(f"unknown element kind {kind}")


def elements_dataset(documents, kind: str):
    """documents Dataset → Dataset of one element kind (lazy branch)."""
    empty = {"node": NODES_SCHEMA, "way": WAYS_SCHEMA, "relation": RELATIONS_SCHEMA}[kind]

    def fn(batch: pa.Table) -> pa.Table:
        out = parse_kind_batch(batch, kind)
        if len(out) == 0:
            return empty.empty_table()
        return out

    return documents.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# single-pass union parse (one corpus read instead of three)
# --------------------------------------------------------------------------

_KIND_CODE = {"node": 0, "way": 1, "relation": 2}

ELEMENTS_ALL_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("ekind", pa.uint8()),  # 0 node / 1 way / 2 relation
        pa.field("lon", pa.float32()),
        pa.field("lat", pa.float32()),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field("members", MEMBERS_TYPE),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", DOC_ID_TYPE),
        pa.field("span_idx", pa.int32()),
    ]
)


def parse_index_batch(batch: pa.Table) -> pa.Table:
    """One documents batch → the JOIN-RELEVANT projection only
    (id, ekind, lon, lat, refs) — the pass-1 parser of the two-pass
    streaming ingest. Skips tag parsing (the only per-row Python in
    the full parse), member parsing, and provenance entirely; relation
    rows carry just their id so the same sweep still yields kind
    counts. Row order per block matches ``parse_all_batch`` (node |
    way | relation, input order within each kind)."""
    spans = explode_spans(batch)
    parts = []
    for kind, code in (("node", 0), ("way", 1), ("relation", 2)):
        sub = spans.filter(pc.equal(spans.column("kind"), kind))
        texts = _combine(sub.column("text"))
        n = len(texts)
        if n == 0:
            continue
        sp = _combine(pc.split_pattern(texts, "|"))
        ids = pc.cast(_field_after(_combine(pc.list_element(sp, 1)), "id="), pa.int64())
        lon = lat = pa.nulls(n, pa.float32())
        refs = pa.nulls(n, pa.list_(pa.int64()))
        if kind == "node":
            lon = pc.cast(
                pc.cast(_field_after(_combine(pc.list_element(sp, 2)), "lon="), pa.float64()),
                pa.float32(),
            )
            lat = pc.cast(
                pc.cast(_field_after(_combine(pc.list_element(sp, 3)), "lat="), pa.float64()),
                pa.float32(),
            )
        elif kind == "way":
            refs_str = _field_after(_combine(pc.list_element(sp, 2)), "refs=")
            refs = _split_list_cast(refs_str, ",", lambda f: pc.cast(f, pa.int64()))
        parts.append(
            pa.table(
                {
                    "id": ids,
                    "ekind": pa.array(np.full(n, code, dtype=np.uint8), pa.uint8()),
                    "lon": lon,
                    "lat": lat,
                    "refs": refs,
                }
            ).cast(ELEMENTS_INDEX_SCHEMA)
        )
    if not parts:
        return ELEMENTS_INDEX_SCHEMA.empty_table()
    return pa.concat_tables(parts)


ELEMENTS_INDEX_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("ekind", pa.uint8()),
        pa.field("lon", pa.float32()),
        pa.field("lat", pa.float32()),
        pa.field("refs", pa.list_(pa.int64())),
    ]
)


def elements_index_dataset(documents):
    """documents Dataset → lazy (id, ekind, lon, lat, refs) projection
    (pass 1 of the two-pass streaming ingest)."""
    return documents.map_batches(
        parse_index_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def parse_all_batch(batch: pa.Table, kinds=("node", "way", "relation")) -> pa.Table:
    """One documents batch → union element table (``kinds``, one
    explode + parse pass; absent columns are null per kind)."""
    parts = []
    for kind in kinds:
        t = parse_kind_batch(batch, kind)
        n = len(t)
        if n == 0:
            continue
        nulls = {
            "lon": pa.nulls(n, pa.float32()),
            "lat": pa.nulls(n, pa.float32()),
            "refs": pa.nulls(n, pa.list_(pa.int64())),
            "members": pa.nulls(n, MEMBERS_TYPE),
        }
        cols = {
            "id": t.column("id"),
            "ekind": pa.array(np.full(n, _KIND_CODE[kind], dtype=np.uint8), pa.uint8()),
            "lon": t.column("lon") if kind == "node" else nulls["lon"],
            "lat": t.column("lat") if kind == "node" else nulls["lat"],
            "refs": t.column("refs") if kind == "way" else nulls["refs"],
            "members": t.column("members") if kind == "relation" else nulls["members"],
            "tags": t.column("tags"),
            "doc_id": t.column("doc_id"),
            "span_idx": t.column("span_idx"),
        }
        parts.append(pa.table(cols).cast(ELEMENTS_ALL_SCHEMA))
    if not parts:
        return ELEMENTS_ALL_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def elements_all_dataset(documents, kinds=("node", "way", "relation")):
    """documents Dataset → lazy union element Dataset (parse ONCE)."""
    return documents.map_batches(
        lambda b: parse_all_batch(b, kinds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_KIND_VIEW_COLS = {
    "node": ("id", "lon", "lat", "tags", "doc_id", "span_idx"),
    "way": ("id", "refs", "tags", "doc_id", "span_idx"),
    "relation": ("id", "members", "tags", "doc_id", "span_idx"),
}


def kind_segment(tbl: pa.Table, code: int) -> pa.Table:
    """Zero-copy extraction of one kind's rows from a union-element
    block.

    ``parse_all_batch`` concatenates kinds in (node, way, relation)
    order, so ``ekind`` ascends within every parse-produced block —
    a kind's rows are ONE contiguous run, found with two searchsorteds
    over the uint8 column and returned as a ``slice`` (no copy). This
    matters because the per-kind extraction otherwise runs as an Arrow
    ``filter`` — a full copy of the kind's bytes per consumer, and in
    the sharded-index ``_shard`` path a copy PER WORKER PROCESS (the
    anti-scaling term of the encode stage at high CPU counts). Falls
    back to the filter copy for blocks that aren't kind-contiguous
    (e.g. blocks that crossed a shuffle)."""
    ek = tbl.column("ekind")
    ekn = ek.to_numpy(zero_copy_only=False) if len(tbl) else np.empty(0, np.uint8)
    if len(ekn) > 1 and not bool(np.all(ekn[1:] >= ekn[:-1])):
        return tbl.filter(pc.equal(ek, code))
    lo = int(np.searchsorted(ekn, code, side="left"))
    hi = int(np.searchsorted(ekn, code, side="right"))
    return tbl.slice(lo, hi - lo)


def kind_view(elements_all, kind: str):
    """Cheap per-kind projection of the (materialized) union table —
    a zero-copy contiguous slice per block (see :func:`kind_segment`)."""
    code = _KIND_CODE[kind]
    cols = _KIND_VIEW_COLS[kind]
    schema = {"node": NODES_SCHEMA, "way": WAYS_SCHEMA, "relation": RELATIONS_SCHEMA}[kind]

    def fn(batch: pa.Table) -> pa.Table:
        sub = kind_segment(batch, code)
        return pa.table({c: sub.column(c) for c in cols}).cast(schema)

    return elements_all.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
