"""Temporal joins — the as-of join the reference family of pipelines
lacks natively (an example of SURVEY.md §2.10's beyond-reference ops).

Scale design: ONE hash exchange. Both sides bucket by
``splitmix64(key) % num_buckets``; each bucket reassembles its two
sides and runs pandas' C-implemented ``merge_asof`` (backward search:
for every left row, the greatest right timestamp ≤ the left
timestamp, per key). Nothing is broadcast or driver-materialized, so
the operator scales with the exchange like any hash join; a pathological
hot key concentrates in one bucket exactly as it would in any
hash-partitioned join (salt upstream if a single key exceeds a worker).

Determinism: multiple right rows can share (key, timestamp) — an
as-of match is then ambiguous and engines disagree on the winner. The
right side is therefore deduplicated to the row with the MAX
``tie_col`` per (key, timestamp) before matching; the DuckDB oracle
applies the same rule, making the operator value-exact against
``ASOF JOIN`` semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import splitmix64

# Group bodies receive the bucket as ARROW and split the two sides
# BEFORE any pandas conversion: the null-padded union keeps exact
# int64 in Arrow, and each side's own columns are null-free, so no
# integer column ever rides through float64 (which silently corrupts
# values above 2^53). Every group output is cast to one fixed Arrow
# schema — block schemas stay identical across buckets (incl. empty
# ones), so the streaming executor's schema-unification path stays
# cold and the "different schema" warnings disappear.


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_key: str | None = None,
    right_cols: tuple[str, ...] = (),
    tie_col: str | None = None,
    num_buckets: int = 64,
):
    """left rows ⋈ latest right row with right_ts ≤ left_ts, per key.

    Inner semantics (left rows with no candidate are dropped) — the
    DuckDB ``ASOF JOIN`` default. Returns a Dataset with the left
    columns plus ``right_ts`` and ``right_cols``.
    """
    rkey = right_key or key
    tie = tie_col or (right_cols[0] if right_cols else right_ts)

    left_schema = left_ds.schema()  # ray Schema: .names + arrow .types
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    rcols = [right_ts, *right_cols]

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        out = batch.append_column("bucket", pa.array(b, pa.int32()))
        out = out.append_column("side", pa.array(np.zeros(len(batch), np.int8), pa.int8()))
        for c in rcols:  # right-side columns ride as nulls
            out = out.append_column(c, pa.nulls(len(batch), _right_types[c]))
        return out

    right_schema = right_ds.schema()
    _rtypes_all = dict(zip(right_schema.names, right_schema.types))
    _right_types = {c: _rtypes_all[c] for c in rcols}

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch.column(rkey).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        cols = {}
        for c in left_cols:
            if c == key:
                cols[c] = batch.column(rkey).cast(left_types[key])
            else:
                cols[c] = pa.nulls(len(batch), left_types[c])
        out = pa.table(cols)
        out = out.append_column("bucket", pa.array(b, pa.int32()))
        out = out.append_column("side", pa.array(np.ones(len(batch), np.int8), pa.int8()))
        for c in rcols:
            out = out.append_column(c, batch.column(c))
        return out

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_cols = [*left_cols, *rcols]
    out_schema = pa.schema(
        [pa.field(c, left_types[c]) for c in left_cols]
        + [pa.field(c, _right_types[c]) for c in rcols]
    )

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = t.column("side")
        left = t.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        right = t.filter(pc.equal(side, 1)).select([key, *rcols]).to_pandas()
        if len(left) == 0 or len(right) == 0:
            return out_schema.empty_table()
        right = right.sort_values([key, right_ts, tie], kind="stable")
        # deterministic tie-break: keep the max-tie_col row per
        # (key, right_ts) — mirrored in the SQL oracle
        right = right.drop_duplicates([key, right_ts], keep="last").reset_index(drop=True)
        # merge_asof null-pads unmatched left rows, promoting integer
        # right columns through float64 — so probe with a bounded row
        # index only, then gather the typed right columns positionally
        probe = right[[key, right_ts]].copy()
        probe["_ridx"] = np.arange(len(right), dtype=np.int64)
        merged = pd.merge_asof(
            left.sort_values(left_ts, kind="stable"),
            probe.sort_values(right_ts, kind="stable"),
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction="backward",
        )
        hit = merged["_ridx"].notna().to_numpy()
        ridx = merged["_ridx"].to_numpy()[hit].astype(np.int64)
        out = merged.loc[hit, left_cols].reset_index(drop=True)
        rsel = right.iloc[ridx].reset_index(drop=True)
        for c in rcols:
            out[c] = rsel[c]
        return pa.Table.from_pandas(out[out_cols], preserve_index=False).cast(out_schema)

    return tagged.groupby("bucket").map_groups(match, batch_format="pyarrow")


def range_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_offset: int,
    hi_offset: int,
    right_key: str | None = None,
    right_cols: tuple[str, ...] = (),
    num_buckets: int = 64,
):
    """left ⋈ every right row of the same key with
    ``left_ts + lo_offset <= right_ts <= left_ts + hi_offset``
    (offsets in the timestamp's integer unit, e.g. microseconds).

    Same single-exchange plan as :func:`asof_join`. Inside a bucket the
    candidate window is found with two vectorized ``searchsorted``
    calls over an exact integer composite ``kcode * (rt_range+1) +
    (rt - rt_min)`` (sorted by construction), then expanded linearly in
    the OUTPUT size — no per-key Python loop, no quadratic scan.
    Partitioning assumption: windowed output per bucket fits a worker
    (bound ``hi_offset - lo_offset`` accordingly at planet scale).
    """
    rkey = right_key or key

    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    rcols = [right_ts, *right_cols]
    right_schema = right_ds.schema()
    _rtypes_all = dict(zip(right_schema.names, right_schema.types))
    _right_types = {c: _rtypes_all[c] for c in rcols}

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        out = batch.append_column("bucket", pa.array(b, pa.int32()))
        out = out.append_column("side", pa.array(np.zeros(len(batch), np.int8), pa.int8()))
        for c in rcols:
            out = out.append_column(c, pa.nulls(len(batch), _right_types[c]))
        return out

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch.column(rkey).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        cols = {}
        for c in left_cols:
            if c == key:
                cols[c] = batch.column(rkey).cast(left_types[key])
            else:
                cols[c] = pa.nulls(len(batch), left_types[c])
        out = pa.table(cols)
        out = out.append_column("bucket", pa.array(b, pa.int32()))
        out = out.append_column("side", pa.array(np.ones(len(batch), np.int8), pa.int8()))
        for c in rcols:
            out = out.append_column(c, batch.column(c))
        return out

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    out_cols = [*left_cols, *rcols]
    out_schema = pa.schema(
        [pa.field(c, left_types[c]) for c in left_cols]
        + [pa.field(c, _right_types[c]) for c in rcols]
    )

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = t.column("side")
        left = t.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        right = t.filter(pc.equal(side, 1)).select([key, *rcols]).to_pandas()
        if len(left) == 0 or len(right) == 0:
            return out_schema.empty_table()
        lk, l_inv = np.unique(left[key].to_numpy(np.int64), return_inverse=True)
        rk_raw = right[key].to_numpy(np.int64)
        # kcode: position of each right key in the LEFT key vocabulary
        # (right keys absent from the left can never match — drop)
        pos = np.searchsorted(lk, rk_raw)
        pos_c = np.clip(pos, 0, len(lk) - 1)
        keep = (pos < len(lk)) & (lk[pos_c] == rk_raw)
        right = right.iloc[np.flatnonzero(keep)]
        if len(right) == 0:
            return out_schema.empty_table()
        kcode = pos_c[keep].astype(np.int64)
        rt = right[right_ts].to_numpy("datetime64[us]").astype(np.int64)
        lt = left[left_ts].to_numpy("datetime64[us]").astype(np.int64)
        rt_min = int(rt.min())
        span = int(rt.max()) - rt_min + 2  # +2: room for side='right' bound
        assert len(lk) < (2**62) // span, "composite overflow — raise num_buckets"
        comp = kcode * span + (rt - rt_min)
        order = np.argsort(comp, kind="stable")
        comp = comp[order]
        right = right.iloc[order]
        lo = l_inv * span + np.clip(lt + lo_offset - rt_min, 0, span - 1)
        hi = l_inv * span + np.clip(lt + hi_offset - rt_min + 1, 0, span - 1)
        lo_i = np.searchsorted(comp, lo, side="left")
        hi_i = np.searchsorted(comp, hi, side="left")
        counts = hi_i - lo_i
        tot = int(counts.sum())
        if tot == 0:
            return out_schema.empty_table()
        lrep = np.repeat(np.arange(len(left)), counts)
        first = np.cumsum(counts) - counts
        ridx = np.arange(tot) - np.repeat(first, counts) + np.repeat(lo_i, counts)
        out = left.iloc[lrep][left_cols].reset_index(drop=True)
        rsel = right.iloc[ridx].reset_index(drop=True)
        for c in rcols:
            out[c] = rsel[c]
        return pa.Table.from_pandas(out[out_cols], preserve_index=False).cast(out_schema)

    return tagged.groupby("bucket").map_groups(match, batch_format="pyarrow")


def sliding_window_agg(
    ds,
    *,
    key: str,
    ts: str,
    value: str,
    window: int,
    num_buckets: int = 64,
):
    """Per row: count and sum of ``value`` over the SAME key's trailing
    ``window`` (timestamp units, e.g. microseconds), inclusive of the
    row itself — the sliding-window twin of the tumbling aggregate.

    One hash exchange (bucket by key), then per bucket: sort once by
    the exact integer composite (kcode * span + rebased ts) and answer
    every row with one vectorized ``searchsorted`` (window start) plus
    prefix-sum differences — O(rows log rows) per bucket, no per-key
    loop. SQL-oracle twin: ``SUM/COUNT OVER (PARTITION BY key ORDER BY
    ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``.

    Ties: rows sharing (key, ts) all receive the FULL tie group's
    aggregate (RANGE semantics, matching SQL; ROWS semantics would be
    order-dependent and nondeterministic under parallel input order).
    """

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    schema = ds.schema()
    cols = list(schema.names)
    out_schema = pa.schema(
        [pa.field(c, t) for c, t in zip(schema.names, schema.types)]
        + [pa.field("w_count", pa.int64()), pa.field("w_sum", pa.float64())]
    )

    def agg(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        k_raw = df[key].to_numpy(np.int64)
        kc, kcode = np.unique(k_raw, return_inverse=True)
        t = df[ts].to_numpy("datetime64[us]").astype(np.int64)
        v = df[value].to_numpy(np.float64)
        t_min = int(t.min())
        span = int(t.max()) - t_min + 2
        assert len(kc) < (2**62) // span, "composite overflow — raise num_buckets"
        comp = kcode.astype(np.int64) * span + (t - t_min)
        order = np.argsort(comp, kind="stable")
        comp_s = comp[order]
        v_s = v[order]
        prefix = np.zeros(len(v_s) + 1, dtype=np.float64)
        np.cumsum(v_s, out=prefix[1:])
        lo = np.searchsorted(comp_s, comp_s - window, side="left")
        # RANGE ... CURRENT ROW includes every row tied at this ts
        hi = np.searchsorted(comp_s, comp_s, side="right")
        # window must not cross the key boundary: comp-window could
        # reach into the previous key's range only if window >= the
        # inter-key gap in composite space — impossible: gap >= span >
        # any in-key time delta >= window is NOT guaranteed for huge
        # windows, so clamp lo to the key segment start
        seg_start = np.searchsorted(comp_s, (comp_s // span) * span, side="left")
        lo = np.maximum(lo, seg_start)
        w_count = (hi - lo).astype(np.int64)
        w_sum = prefix[hi] - prefix[lo]
        out = df.iloc[order][cols].reset_index(drop=True)
        out["w_count"] = w_count
        out["w_sum"] = w_sum
        return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(agg, batch_format="pandas")
    )


def lag_delta(
    ds,
    *,
    key: str,
    ts: str,
    tiebreak: str,
    num_buckets: int = 64,
):
    """Per row: microseconds since the SAME key's previous row in
    (ts, tiebreak) order — the LAG window primitive (first row per key
    gets null). One hash exchange (bucket by key), per bucket one
    lexsort + one shifted subtraction; (ts, tiebreak) must be unique
    per key for a total order, which makes the output deterministic
    under any partitioning. SQL twin: ``ts - LAG(ts) OVER (PARTITION
    BY key ORDER BY ts, tiebreak)``.
    """

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    schema = ds.schema()
    cols = list(schema.names)
    out_schema = pa.schema(
        [pa.field(c, t) for c, t in zip(schema.names, schema.types)]
        + [pa.field("lag_us", pa.int64())]
    )

    def agg(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        k = df[key].to_numpy(np.int64)
        t = df[ts].to_numpy("datetime64[us]").astype(np.int64)
        tb = df[tiebreak].to_numpy(np.int64)
        order = np.lexsort((tb, t, k))
        ks, ts_ = k[order], t[order]
        valid = np.zeros(len(ks), dtype=bool)
        valid[1:] = ks[1:] == ks[:-1]
        lag = np.zeros(len(ks), dtype=np.int64)
        lag[1:] = np.where(valid[1:], ts_[1:] - ts_[:-1], 0)
        out = df.iloc[order][cols].reset_index(drop=True)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        tbl = tbl.append_column(
            "lag_us", pa.array(lag, pa.int64(), mask=~valid)  # first-of-key → null
        )
        return tbl.cast(out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(agg, batch_format="pandas")
    )
