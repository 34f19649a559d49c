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

    cols = list(ds.schema().names)

    def prune(batch: pa.Table) -> pa.Table:
        """Local pre-prune: a row outside its key's top-k WITHIN THIS
        BATCH cannot be in the global top-k; keep <= k rows per (key,
        batch) so the exchange is bounded."""
        df = batch.to_pandas()
        order = np.lexsort(
            (-df[tie_col].to_numpy(), -df[val].to_numpy(), df[key].to_numpy())
        )
        d = df.iloc[order]
        rank = d.groupby(key, sort=False).cumcount()
        kept = d[rank < k]
        kbuck = (
            splitmix64(kept[key].to_numpy(np.uint64)) % np.uint64(num_buckets)
        ).astype(np.int32)
        out = pa.Table.from_pandas(kept, preserve_index=False)
        return out.append_column("bucket", pa.array(kbuck, pa.int32()))

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df[cols].copy()
            out["rank"] = pd.Series([], dtype="int64")
            return out
        order = np.lexsort(
            (-df[tie_col].to_numpy(), -df[val].to_numpy(), df[key].to_numpy())
        )
        d = df.iloc[order]
        rank = d.groupby(key, sort=False).cumcount() + 1
        out = d[rank <= k][cols].reset_index(drop=True)
        out["rank"] = rank[rank <= k].to_numpy(np.int64)
        return out

    return (
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pandas")
    )
