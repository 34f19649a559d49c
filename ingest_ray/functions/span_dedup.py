"""Span-level exact deduplication with document reassembly — the
C4 / RefinedWeb "drop repeated spans, keep the first occurrence"
hygiene step for LLM training corpora.

Each document is split into spans — fixed ``window``-token word
windows (stride = window, reusing the :mod:`.chunking` kernel) or,
when ``delimiter`` is given, delimiter-separated paragraphs/lines —
and each DISTINCT span text survives only at its globally FIRST
occurrence (lexicographically smallest ``(doc_id, ord)``). All other
occurrences are dropped and each document's surviving spans are
reassembled in original order; documents that lose every span are
dropped entirely (they contribute no text), matching the SQL twin.

Scale plan — two bounded exchanges, no driver-side state:

1. **split** — zero-shuffle ``map_batches``; spans come from Arrow
   offset arithmetic (no per-row Python).
2. **per-batch combiner** — within a batch only the lexmin
   ``(doc_id, ord)`` row per DISTINCT span leaves the task, so a span
   repeated k times in one batch costs one exchange row. A span
   repeated 10⁹ times corpus-wide ships ≤ 1 row per input batch, all
   to one bucket whose work is then a lexsort over ≤ n_batches rows —
   the hot-key path is bounded by batch count, not occurrence count.
3. **winner stage** — spans hash-bucket by span text (FNV-1a ×
   splitmix64); one vectorized lexsort + run-boundary take per bucket
   emits the winning rows. Winners already carry their text, so no
   join back to the corpus is needed.
4. **reassembly** — winners hash-bucket by ``doc_id``; per bucket one
   lexsort ``(doc_id, ord)``, run-boundary detection, and a single
   ``pc.binary_join`` over a list array rebuilds every document in
   the bucket (vectorized across documents — no per-document group
   calls).

Reference scope note: the reference engine (peermaps/ingest) has no
text-dedup counterpart; this operator belongs to the repo's
LLM-training-data family (SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import effective_num_partitions, hash64_arrow, splitmix64
from .chunking import chunk_batch

SPAN_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("doc_id", pa.int64()),
        pa.field("ord", pa.int32()),
        pa.field("span", pa.string()),
    ]
)

WINNER_SCHEMA = pa.schema(
    [
        pa.field("dbucket", pa.int32()),
        pa.field("doc_id", pa.int64()),
        pa.field("ord", pa.int32()),
        pa.field("span", pa.string()),
    ]
)

OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("text", pa.string()),
        pa.field("n_kept", pa.int64()),
    ]
)


def _first_per_span(tbl: pa.Table) -> pa.Table:
    """Keep the lexmin ``(doc_id, ord)`` row per distinct ``span`` —
    one sort + one run-boundary filter, fully vectorized."""
    if tbl.num_rows <= 1:
        return tbl
    idx = pc.sort_indices(
        tbl,
        sort_keys=[
            ("span", "ascending"),
            ("doc_id", "ascending"),
            ("ord", "ascending"),
        ],
    )
    t = tbl.take(idx)
    arr = t.column("span").combine_chunks()
    neq = pc.not_equal(arr.slice(1), arr.slice(0, len(arr) - 1)).to_numpy(
        zero_copy_only=False
    )
    first = np.concatenate([[True], neq])
    return t.filter(pa.array(first))


def _split_spans(
    batch: pa.Table,
    *,
    window: int,
    delimiter: str | None,
    doc_col: str,
    text_col: str,
) -> pa.Table:
    """documents batch → (doc_id, ord, span) rows."""
    if delimiter is None:
        ch = chunk_batch(
            batch, window=window, overlap=0, doc_col=doc_col, text_col=text_col
        )
        return pa.table(
            {
                "doc_id": ch.column("doc_id"),
                "ord": ch.column("chunk_idx"),
                "span": ch.column("chunk_text"),
            }
        )
    spans = pc.split_pattern(batch.column(text_col).combine_chunks(), delimiter)
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    rep = np.repeat(np.arange(len(n), dtype=np.int64), n)
    run_start = np.cumsum(n) - n
    ords = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(run_start, n)
    return pa.table(
        {
            "doc_id": batch.column(doc_col).take(pa.array(rep, pa.int64())).cast(
                pa.int64()
            ),
            "ord": pa.array(ords.astype(np.int32), pa.int32()),
            "span": spans.values,
        }
    )


def dedup_spans(
    docs_ds,
    *,
    window: int = 2,
    delimiter: str | None = None,
    num_partitions: int = 32,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """documents → (doc_id, text, n_kept) with every repeated span
    removed except its first occurrence. ``delimiter=None`` splits
    into fixed ``window``-token word windows (rejoined with a single
    space); a ``delimiter`` string splits on it and rejoins with it.
    """
    join_delim = " " if delimiter is None else delimiter
    nb = effective_num_partitions(num_partitions)

    def split_combine(batch: pa.Table) -> pa.Table:
        t = _split_spans(
            batch,
            window=window,
            delimiter=delimiter,
            doc_col=doc_col,
            text_col=text_col,
        )
        t = _first_per_span(t)
        if t.num_rows == 0:
            return SPAN_SCHEMA.empty_table()
        h = splitmix64(hash64_arrow(t.column("span")))
        bucket = (h % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int32()),
                "doc_id": t.column("doc_id"),
                "ord": t.column("ord"),
                "span": t.column("span"),
            }
        ).cast(SPAN_SCHEMA)

    def winners(group: pa.Table) -> pa.Table:
        t = _first_per_span(group.select(["doc_id", "ord", "span"]))
        if t.num_rows == 0:
            return WINNER_SCHEMA.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dbucket = (splitmix64(doc.view(np.uint64)) % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {
                "dbucket": pa.array(dbucket, pa.int32()),
                "doc_id": t.column("doc_id"),
                "ord": t.column("ord"),
                "span": t.column("span"),
            }
        ).cast(WINNER_SCHEMA)

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        idx = pc.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("ord", "ascending")]
        )
        t = group.take(idx)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.concatenate([[True], doc[1:] != doc[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.concatenate([starts, [len(doc)]]))
        if len(doc) >= 2**31:
            raise ValueError("reassembly bucket exceeds int32 list offsets")
        offsets = np.concatenate([starts, [len(doc)]]).astype(np.int32)
        spans = t.column("span").combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), spans)
        text = pc.binary_join(lists, join_delim)
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "text": text,
                "n_kept": pa.array(counts.astype(np.int64), pa.int64()),
            }
        ).cast(OUT_SCHEMA)

    spans_ds = docs_ds.map_batches(
        split_combine, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = spans_ds.groupby("bucket").map_groups(
        winners, batch_format="pyarrow"
    )
    return kept.groupby("dbucket").map_groups(assemble, batch_format="pyarrow")
