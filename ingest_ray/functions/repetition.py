"""Repetition-based quality statistics for LLM corpus filtering —
the Gopher/MassiveText "repetitious document" signals.

Per document: token count, DISTINCT token count, the occurrence count
of the single most frequent word bigram, and the total bigram count.
Downstream filters derive the published ratios from these —
``1 − n_distinct_tokens/n_tokens`` (duplicate-token fraction) and
``top_bigram_count/n_bigrams`` (top-2-gram fraction, Gopher drops
docs above 0.20) — but this operator deliberately emits the integer
numerators/denominators, not the floats: integers hash-match the
DuckDB oracle exactly, and the caller picks thresholds.

Zero shuffles. The per-batch kernel never touches a Python row:
tokens come from one ``pc.split_pattern``; per-row DISTINCT counts
from one Arrow C sort of the exploded ``(row, token)`` table plus a
numpy run-boundary bincount; the top-bigram count from one sort of
the ``(row, w1, w2)`` adjacency table plus ``maximum.reduceat`` over
run lengths. Exactness note: tokens are compared as STRINGS in the
sorts (no hashing), so distinct counts carry no collision caveat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("n_distinct_tokens", pa.int64()),
        pa.field("top_bigram_count", pa.int64()),
        pa.field("n_bigrams", pa.int64()),
    ]
)


def repetition_stats_batch(
    batch: pa.Table, *, doc_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    nrows = batch.num_rows
    if nrows == 0:
        return OUT_SCHEMA.empty_table()
    toks = pc.split_pattern(batch.column(text_col).combine_chunks(), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    row = np.repeat(np.arange(nrows, dtype=np.int64), n)
    vals = toks.values

    # distinct tokens per row: sort (row, w), count run starts per row
    exp = pa.table({"row": pa.array(row, pa.int64()), "w": vals})
    idx = pc.sort_indices(
        exp, sort_keys=[("row", "ascending"), ("w", "ascending")]
    )
    srow = row[idx.to_numpy(zero_copy_only=False)]
    sw = vals.take(idx)
    if total > 1:
        w_change = pc.not_equal(sw.slice(1), sw.slice(0, total - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.concatenate([[True], (srow[1:] != srow[:-1]) | w_change])
    else:
        new_run = np.ones(total, dtype=bool)
    n_distinct = np.bincount(srow[new_run], minlength=nrows).astype(np.int64)

    # top bigram per row: adjacent same-row (w1, w2) pairs
    adj = np.flatnonzero(row[1:] == row[:-1]) if total > 1 else np.empty(0, np.int64)
    top = np.zeros(nrows, dtype=np.int64)
    if len(adj):
        brow = row[adj]
        bt = pa.table(
            {
                "row": pa.array(brow, pa.int64()),
                "w1": vals.take(pa.array(adj, pa.int64())),
                "w2": vals.take(pa.array(adj + 1, pa.int64())),
            }
        )
        bidx = pc.sort_indices(
            bt,
            sort_keys=[
                ("row", "ascending"),
                ("w1", "ascending"),
                ("w2", "ascending"),
            ],
        )
        bi = bidx.to_numpy(zero_copy_only=False)
        sbrow = brow[bi]
        s1 = bt.column("w1").combine_chunks().take(bidx)
        s2 = bt.column("w2").combine_chunks().take(bidx)
        m = len(bi)
        if m > 1:
            change = (
                (sbrow[1:] != sbrow[:-1])
                | pc.not_equal(s1.slice(1), s1.slice(0, m - 1)).to_numpy(
                    zero_copy_only=False
                )
                | pc.not_equal(s2.slice(1), s2.slice(0, m - 1)).to_numpy(
                    zero_copy_only=False
                )
            )
            starts = np.flatnonzero(np.concatenate([[True], change]))
        else:
            starts = np.zeros(1, dtype=np.int64)
        run_len = np.diff(np.concatenate([starts, [m]]))
        run_row = sbrow[starts]
        # per-row max run length: rows are contiguous in run_row
        row_starts = np.flatnonzero(
            np.concatenate([[True], run_row[1:] != run_row[:-1]])
        )
        row_max = np.maximum.reduceat(run_len, row_starts)
        top[run_row[row_starts]] = row_max

    return pa.table(
        {
            "doc_id": batch.column(doc_col).cast(pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "top_bigram_count": pa.array(top, pa.int64()),
            "n_bigrams": pa.array(np.maximum(n - 1, 0), pa.int64()),
        }
    ).cast(OUT_SCHEMA)


def repetition_stats(docs_ds, **cols):
    """documents → per-doc repetition statistics (integer-exact)."""

    def fn(batch: pa.Table) -> pa.Table:
        return repetition_stats_batch(batch, **cols)

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
