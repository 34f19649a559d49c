"""Document chunking for LLM training pipelines: split each document
into fixed-size token windows with overlap.

Zero-shuffle, fully Arrow-vectorized: tokens come from one
``pc.split_pattern`` per batch, per-chunk token ranges are built with
numpy offset arithmetic over the flattened token buffer, and chunk
texts are reassembled with one ``take`` + ``pc.binary_join`` — no
Python loop touches a row. A chunk belongs to exactly one input row,
so the operator composes with :mod:`.packing` (global offsets) and
:mod:`.sampling` downstream without any exchange of its own.

Token definition is a single-space split (matching the DuckDB oracle's
``string_split(text, ' ')`` exactly, empty tokens preserved).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("chunk_idx", pa.int32()),
        pa.field("n_tok", pa.int32()),
        pa.field("chunk_text", pa.string()),
    ]
)


def chunk_batch(
    batch: pa.Table,
    *,
    window: int,
    overlap: int,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """One batch → its chunk rows. stride = window − overlap; a doc of
    n ≤ window tokens yields exactly one chunk; otherwise
    ``ceil((n − window)/stride) + 1`` chunks, the last one truncated at
    the document end (never padded)."""
    if overlap >= window:
        raise ValueError("overlap must be smaller than window")
    stride = window - overlap

    toks = pc.split_pattern(batch.column(text_col).combine_chunks(), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)

    total = int(n_chunks.sum())
    if total == 0:
        return OUT_SCHEMA.empty_table()
    rep = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    run_start = np.cumsum(n_chunks) - n_chunks
    within = np.arange(total, dtype=np.int64) - np.repeat(run_start, n_chunks)
    starts = within * stride
    ends = np.minimum(starts + window, n[rep])

    # flatten: chunk j of doc d = token values [off[d]+start, off[d]+end)
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_off = off[:-1]
    lens = ends - starts
    tt = int(lens.sum())
    c_start = doc_off[rep] + starts
    run2 = np.cumsum(lens) - lens
    flat_idx = np.arange(tt, dtype=np.int64) - np.repeat(run2, lens) + np.repeat(
        c_start, lens
    )
    values = toks.values.take(pa.array(flat_idx, pa.int64()))
    cum = np.concatenate([[0], np.cumsum(lens)])
    if cum[-1] >= 2**31:
        raise ValueError(
            f"chunk expansion totals {int(cum[-1])} tokens (>= 2^31) in one "
            "batch — lower the batch size so list offsets fit int32"
        )
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(cum.astype(np.int32), pa.int32()),
        values,
    )
    chunk_text = pc.binary_join(chunk_lists, " ")

    return pa.table(
        {
            "doc_id": batch.column(doc_col).take(pa.array(rep, pa.int64())).cast(pa.int64()),
            "chunk_idx": pa.array(within.astype(np.int32), pa.int32()),
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
            "chunk_text": chunk_text,
        }
    ).cast(OUT_SCHEMA)


def chunk_documents(docs_ds, *, window: int = 64, overlap: int = 16, **cols):
    """documents → chunk rows (doc_id, chunk_idx, n_tok, chunk_text)."""

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_batch(batch, window=window, overlap=overlap, **cols)

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
