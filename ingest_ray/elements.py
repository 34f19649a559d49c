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

NODES_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)

WAYS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field("tags", TAGS_TYPE),
        pa.field("doc_id", pa.string()),
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
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)


def _tags_to_arrow(tag_lists: list[list[tuple[str, str]]]) -> pa.Array:
    return pa.array(
        [[{"key": k, "value": v} for k, v in tags] for tags in tag_lists], type=TAGS_TYPE
    )


def parse_kind_batch(batch: pa.Table, kind: str) -> pa.Table:
    """One documents batch → element table of a single kind."""
    spans = explode_spans(batch)
    mask = pc.equal(spans.column("kind"), kind)
    spans = spans.filter(mask)
    texts = spans.column("text").to_pylist()
    doc_ids = spans.column("doc_id")
    span_idx = spans.column("span_idx")

    ids = np.empty(len(texts), dtype=np.int64)
    tag_lists: list[list[tuple[str, str]]] = []
    if kind == "node":
        lons = np.empty(len(texts), dtype=np.float64)
        lats = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            el = parse_geo_span(kind, t)
            ids[i] = el["id"]
            lons[i] = el["lon"]
            lats[i] = el["lat"]
            tag_lists.append(el["tags"])
        return pa.table(
            {
                "id": pa.array(ids),
                "lon": pa.array(lons),
                "lat": pa.array(lats),
                "tags": _tags_to_arrow(tag_lists),
                "doc_id": doc_ids,
                "span_idx": span_idx,
            }
        ).cast(NODES_SCHEMA)
    if kind == "way":
        refs_lists = []
        for i, t in enumerate(texts):
            el = parse_geo_span(kind, t)
            ids[i] = el["id"]
            refs_lists.append(el["refs"])
            tag_lists.append(el["tags"])
        return pa.table(
            {
                "id": pa.array(ids),
                "refs": pa.array(refs_lists, pa.list_(pa.int64())),
                "tags": _tags_to_arrow(tag_lists),
                "doc_id": doc_ids,
                "span_idx": span_idx,
            }
        ).cast(WAYS_SCHEMA)
    if kind == "relation":
        member_lists = []
        for i, t in enumerate(texts):
            el = parse_geo_span(kind, t)
            ids[i] = el["id"]
            member_lists.append(el["members"])
            tag_lists.append(el["tags"])
        return pa.table(
            {
                "id": pa.array(ids),
                "members": pa.array(member_lists, MEMBERS_TYPE),
                "tags": _tags_to_arrow(tag_lists),
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
