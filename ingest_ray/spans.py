"""Span text codec for the interleaved-document input format.

Input table (BASELINE.json ``input_hint`` / FIXTURES.md §1):

    documents(doc_id: string,
              spans: list<struct<kind: string, text: string,
                                 media_ref: string, offset: int32>>)

Geo spans (``kind ∈ {node, way, relation}``) carry one serialized
element per span in the deterministic pipe-delimited line grammar of
FIXTURES.md §1.1::

    node|id=1312|lon=13.02|lat=37.00|tags=amenity=cafe
    way|id=555|refs=1313,1314,1315,1313|tags=leisure=park;name=triangle park
    relation|id=700|members=way:outer:600,way:inner:601|tags=type=multipolygon

``text`` and ``media`` spans are carried through untouched; the
per-row invariant is span-sequence equality (kind, text, media_ref,
order) end-to-end — validated by ``span_sequence_hash``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import hash64_str

GEO_KINDS = ("node", "way", "relation")


def _fmt_float(v: float) -> str:
    return repr(float(v))


def _fmt_tags(tags: list[tuple[str, str]]) -> str:
    return ";".join(f"{k}={v}" for k, v in tags)


def _parse_tags(s: str) -> list[tuple[str, str]]:
    if not s:
        return []
    out = []
    for part in s.split(";"):
        k, _, v = part.partition("=")
        out.append((k, v))
    return out


def serialize_node(nid: int, lon: float, lat: float, tags: list[tuple[str, str]]) -> str:
    return f"node|id={nid}|lon={_fmt_float(lon)}|lat={_fmt_float(lat)}|tags={_fmt_tags(tags)}"


def serialize_way(wid: int, refs: list[int], tags: list[tuple[str, str]]) -> str:
    return f"way|id={wid}|refs={','.join(str(r) for r in refs)}|tags={_fmt_tags(tags)}"


def serialize_relation(
    rid: int, members: list[tuple[str, str, int]], tags: list[tuple[str, str]]
) -> str:
    """members are (mtype, role, ref) triplets, e.g. ("way","outer",600)."""
    ms = ",".join(f"{t}:{role}:{ref}" for t, role, ref in members)
    return f"relation|id={rid}|members={ms}|tags={_fmt_tags(tags)}"


def parse_geo_span(kind: str, text: str) -> dict:
    """Parse one geo span line → element dict. Raises on malformed input."""
    parts = text.split("|")
    if parts[0] != kind:
        raise ValueError(f"span kind {kind!r} != line kind {parts[0]!r}")
    fields = {}
    for part in parts[1:]:
        k, _, v = part.partition("=")
        fields[k] = v
    out: dict = {"id": int(fields["id"]), "tags": _parse_tags(fields.get("tags", ""))}
    if kind == "node":
        # f32 narrowing mirrors the engine's coordinate model: every
        # consumer works in f32 (reference stores f32, src/lib.rs:150),
        # so elements carry f32 from the parse on
        import numpy as _np

        # two-step f64 → f32 (not a direct string → f32 parse) so the
        # rounding route matches the vectorized cast chain exactly
        out["lon"] = float(_np.float32(float(fields["lon"])))
        out["lat"] = float(_np.float32(float(fields["lat"])))
    elif kind == "way":
        refs = fields.get("refs", "")
        out["refs"] = [int(r) for r in refs.split(",")] if refs else []
    elif kind == "relation":
        members = []
        ms = fields.get("members", "")
        if ms:
            for m in ms.split(","):
                mtype, role, ref = m.split(":")
                members.append({"mtype": mtype, "role": role, "ref": int(ref)})
        out["members"] = members
    else:
        raise ValueError(f"not a geo span kind: {kind}")
    return out


SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(SPAN_STRUCT))]
)


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents batch → one row per span, carrying (doc_id, span_idx).

    Pure Arrow explode (list flatten + parent repeat) — zero row loops.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    raw = spans.offsets.to_numpy(zero_copy_only=False)
    import numpy as np

    offsets = raw - raw[0]  # re-base: sliced arrays keep parent offsets
    counts = np.diff(offsets)
    parent_idx = np.repeat(np.arange(len(batch)), counts)
    span_idx = np.arange(offsets[-1], dtype=np.int32) - np.repeat(
        offsets[:-1], counts
    ).astype(np.int32)
    flat = spans.flatten()
    return pa.table(
        {
            "doc_id": doc_ids.take(pa.array(parent_idx)),
            "span_idx": pa.array(span_idx, pa.int32()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def span_sequence_hash(batch: pa.Table) -> pa.Table:
    """Per-document hash of the ordered span sequence
    (kind, text, media_ref, order) — the end-to-end invariant
    (BASELINE.json per-row invariant; FIXTURES.md §1).

    Input: documents batch. Output: (doc_id, span_seq_hash uint64).
    """
    import pyarrow.compute as pc

    from .util import hash64_arrow

    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    # fully Arrow-side sequence assembly (no per-span Python): fragment
    # = kind 0x1e text 0x1e media_ref, doc sequence = 0x1f-joined
    off = spans_col.offsets.to_numpy(zero_copy_only=False)
    off = (off - off[0]).astype(np.int32)
    flat = spans_col.flatten()
    frags = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"), "\x1e"
    )
    fr_list = pa.ListArray.from_arrays(pa.array(off, pa.int32()), frags)
    seqs = pc.binary_join(fr_list, "\x1f")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "span_seq_hash": pa.array(hash64_arrow(seqs), pa.uint64()),
        }
    )
