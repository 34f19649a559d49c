"""Pivot (long → wide counts): one row per key, one int64 count column
per category.

Two-pass plan: (1) category discovery — per-batch distinct category
strings, driver merge under ``vocab_limit`` (pivot output width IS the
category count, so a bounded vocabulary is inherent to the operator,
not an implementation shortcut); (2) per-batch partial pivot — each
batch pre-aggregates its own (key × category) counts into the wide
layout (the combiner), then ONE groupby-sum over keys merges partials.
The exchange carries at most one wide row per (key, batch), never one
row per input event.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def discover_categories(ds, cat_col: str, *, vocab_limit: int = 10_000) -> list[str]:
    """Sorted distinct category values via per-batch pre-dedup + driver
    merge; raises past ``vocab_limit`` (a pivot that wide is a schema
    design error, not a bigger-machine problem)."""
    cats: set[str] = set()
    for b in ds.select_columns([cat_col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        cats.update(b.column(cat_col).unique().to_pylist())
        if len(cats) > vocab_limit:
            raise ValueError(
                f"pivot category column exceeds vocab_limit={vocab_limit}"
            )
    return sorted(cats)


def pivot_counts(
    ds,
    *,
    row_key: str,
    cat_col: str,
    categories: list[str] | None = None,
    vocab_limit: int = 10_000,
    prefix: str = "n_",
):
    """``ds`` (long) → wide counts: (row_key, n_<cat>, …), one row per
    distinct key, columns in sorted category order."""
    if categories is None:
        categories = discover_categories(ds, cat_col, vocab_limit=vocab_limit)
    cats = np.array(sorted(categories))
    ncat = len(cats)
    names = [f"{prefix}{c}" for c in cats]
    OUT = pa.schema(
        [pa.field(row_key, pa.int64())] + [pa.field(n, pa.int64()) for n in names]
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(row_key).to_numpy(zero_copy_only=False).astype(np.int64)
        cv = np.asarray(batch.column(cat_col).to_pylist())
        codes = np.searchsorted(cats, cv)
        codes_c = np.clip(codes, 0, max(ncat - 1, 0))
        known = (codes < ncat) & (cats[codes_c] == cv) if ncat else np.zeros(len(cv), bool)
        keys, codes = keys[known], codes[known]
        order = np.lexsort((codes, keys))
        ks, cs = keys[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (ks[1:] != ks[:-1]) | (cs[1:] != cs[:-1])])
        )
        run_len = np.diff(np.concatenate([starts, [len(ks)]]))
        gk, gc = ks[starts], cs[starts]
        ukeys, key_idx = np.unique(gk, return_inverse=True)
        mat = np.zeros((len(ukeys), ncat), dtype=np.int64)
        mat[key_idx, gc] = run_len
        cols = {row_key: pa.array(ukeys, pa.int64())}
        for j, nm in enumerate(names):
            cols[nm] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols).cast(OUT)

    from ray.data.aggregate import Sum

    wide = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = wide.groupby(row_key).aggregate(*[Sum(n, alias_name=n) for n in names])

    def fix_schema(batch: pa.Table) -> pa.Table:
        cols = {row_key: batch.column(row_key).cast(pa.int64())}
        for n in names:
            cols[n] = batch.column(n).cast(pa.int64())
        return pa.table(cols).cast(OUT)

    return agg.map_batches(fix_schema, batch_format="pyarrow", zero_copy_batch=True)
