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


def grouped_quantiles(
    ds,
    *,
    key: str,
    value: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    names: tuple[str, ...] | None = None,
    num_buckets: int = 64,
):
    """Exact per-group quantiles (``quantile_disc`` semantics: the
    element at rank ceil(q·n)−1) — one hash exchange on the group key,
    then per bucket ONE lexsort over (key, value) and a vectorized
    rank pick per group segment; no per-key loop, so a bucket with
    10⁶ small groups costs the same sort as one large group. String
    keys hash via the corpus-stable hash64.

    Returns one row per group: (key, q_<name>…). Values are actual
    column elements — no interpolation — so the DuckDB oracle
    (``quantile_disc(value, q)``) matches bit for bit.
    """
    import pandas as pd

    from ..util import splitmix64

    names = names or tuple(f"q{int(q * 100)}" for q in qs)

    def tag(batch: pa.Table) -> pa.Table:
        col = batch.column(key)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from .multimodal import hash64_str

            k = hash64_str(col.to_pylist())
        else:
            k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int32()),
                "k": col,
                "v": batch.column(value).cast(pa.float64()),
            }
        )

    schema = ds.schema()
    key_type = dict(zip(schema.names, schema.types))[key]
    out_schema = pa.schema(
        [pa.field(key, key_type)] + [pa.field(n, pa.float64()) for n in names]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        kcol = df["k"].to_numpy()
        v = df["v"].to_numpy(np.float64)
        ku, kcode = np.unique(kcol, return_inverse=True)
        order = np.lexsort((v, kcode))
        kc_s, v_s = kcode[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True], kc_s[1:] != kc_s[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(kc_s)]]))
        cols = {key: pa.array(ku[kc_s[starts]]).cast(key_type)}
        for q, n in zip(qs, names):
            ranks = starts + np.maximum(np.ceil(q * lens).astype(np.int64) - 1, 0)
            cols[n] = pa.array(v_s[ranks], pa.float64())
        return pa.table(cols).cast(out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def filter_by_group_quantile(
    ds,
    *,
    key: str,
    value: str,
    q: float = 0.5,
    num_buckets: int = 64,
):
    """Keep rows whose ``value`` ≥ their group's exact q-quantile
    (``quantile_disc`` rank semantics) — the per-language
    quality-threshold filter of a training-data pipeline.

    The threshold table from :func:`grouped_quantiles` has ONE row per
    group (languages, domains — sublinear in corpus size by contract),
    so it broadcasts via ``ray.put`` once and every batch filters with
    one searchsorted; the corpus itself never shuffles.
    """
    import ray

    from .multimodal import hash64_str

    th = grouped_quantiles(
        ds, key=key, value=value, qs=(q,), names=("th",), num_buckets=num_buckets
    )
    parts = list(th.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    tt = pa.concat_tables(parts) if parts else None
    if tt is None or len(tt) == 0:
        return ds.limit(0)
    kcol = tt.column(key)
    string_key = pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type)
    if string_key:
        kv = hash64_str(kcol.to_pylist())
    else:
        kv = kcol.to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(kv)
    thresholds_ref = ray.put(
        (kv[order], tt.column("th").to_numpy(zero_copy_only=False)[order])
    )

    def keep(batch: pa.Table) -> pa.Table:
        keys, ths = ray.get(thresholds_ref)
        col = batch.column(key)
        if string_key:
            bk = hash64_str(col.to_pylist())
        else:
            bk = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(keys, bk)
        pos = np.minimum(pos, len(keys) - 1)
        # every row's group exists in the threshold table by construction;
        # verify it so a missing group or a 64-bit string-hash collision
        # fails loudly instead of applying a neighbor's threshold
        if len(bk) and not np.array_equal(keys[pos], bk):
            bad = bk[keys[pos] != bk][:5]
            raise ValueError(
                f"filter_by_group_quantile: {np.count_nonzero(keys[pos] != bk)} rows "
                f"whose group key is absent from the threshold table (or a 64-bit "
                f"hash collision for string keys); first offenders: {bad.tolist()}"
            )
        v = batch.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(v >= ths[pos]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
