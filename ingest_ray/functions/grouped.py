"""Grouped (per-key) top-k — the distributed QUALIFY row_number() <= k.

One hash exchange (bucket by key); inside a bucket ALL keys' rows are
ranked in a single lexsort + cumcount pass (no per-key Python). Ranks
tie-break deterministically on ``tie_col`` so the output is value-exact
against the SQL oracle's ``ORDER BY val DESC, tie DESC`` window.

Scale note: only (key, val, carried columns) shuffle; a combiner-style
per-batch pre-prune (keep each batch's local top-k per key) bounds the
exchange at k rows per (key, batch) — the same partial-aggregate
pushdown the q1 pipeline uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import splitmix64


def grouped_topk(
    ds,
    *,
    key: str,
    val: str,
    k: int,
    tie_col: str,
    num_buckets: int = 64,
):
    """Top ``k`` rows per key by descending ``val`` (ties broken by
    descending ``tie_col`` — deterministic). Returns all input columns
    plus ``rank`` (1-based)."""

    schema = ds.schema()
    cols = list(schema.names)
    out_schema = pa.schema(
        [pa.field(c, t) for c, t in zip(schema.names, schema.types)]
        + [pa.field("rank", pa.int64())]
    )

    def _topk_sel(keyv, valv, tiev, cap):
        """Indices of each key's top-``cap`` rows (desc val, desc tie),
        plus their 0-based within-key ranks — one lexsort, no pandas."""
        order = np.lexsort((-tiev, -valv, keyv))
        ks = keyv[order]
        newk = np.empty(len(ks), dtype=bool)
        newk[0] = True
        newk[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(newk)
        seg_of = np.cumsum(newk) - 1
        rank0 = np.arange(len(ks), dtype=np.int64) - starts[seg_of]
        keep = rank0 < cap
        return order[keep], rank0[keep]

    def prune(batch: pa.Table) -> pa.Table:
        """Local pre-prune: a row outside its key's top-k WITHIN THIS
        BATCH cannot be in the global top-k; keep <= k rows per (key,
        batch) so the exchange is bounded."""
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int32()))
        keyv = batch.column(key).to_numpy(zero_copy_only=False)
        valv = batch.column(val).to_numpy(zero_copy_only=False)
        tiev = batch.column(tie_col).to_numpy(zero_copy_only=False)
        sel, _ = _topk_sel(keyv, valv, tiev, k)
        kept = batch.take(pa.array(np.sort(sel), pa.int64()))
        kbuck = (
            splitmix64(keyv[np.sort(sel)].astype(np.uint64)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return kept.append_column("bucket", pa.array(kbuck, pa.int32()))

    def rank_group(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        keyv = t.column(key).to_numpy(zero_copy_only=False)
        valv = t.column(val).to_numpy(zero_copy_only=False)
        tiev = t.column(tie_col).to_numpy(zero_copy_only=False)
        sel, rank0 = _topk_sel(keyv, valv, tiev, k)
        out = t.select(cols).take(pa.array(sel, pa.int64()))
        out = out.append_column("rank", pa.array(rank0 + 1, pa.int64()))
        return out.cast(out_schema)

    return (
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )
