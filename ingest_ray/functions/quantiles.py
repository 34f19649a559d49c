"""Exact distributed quantiles — iterative range refinement.

Exact order statistics over a column no single worker can hold: each
round one streaming pass histograms every still-open quantile's
current interval into ``num_buckets`` sub-ranges (a Q×B int matrix
per batch — scalars, not rows), the driver walks the tiny cumulative
counts to find the bucket containing the target rank, and the
interval shrinks ×B. When an interval's population falls under
``collect_limit`` (or collapses to one value) the exact element is
selected from a bounded driver collect. Doubles converge in 1–2
rounds on any realistic distribution (geometric width shrink), and
the result is an ACTUAL ELEMENT of the column — no interpolation, no
float arithmetic — so it hash-matches DuckDB's ``quantile_disc``
(rank = ceil(q·n)−1, pinned empirically) bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def exact_quantiles(
    ds,
    *,
    col: str,
    qs: tuple[float, ...],
    num_buckets: int = 1024,
    collect_limit: int = 1_000_000,
    max_rounds: int = 64,
):
    """Returns {q: value} with value = the column's element at rank
    ceil(q·n)−1 (DuckDB quantile_disc semantics).

    Interval edges are float64, so column values must be exactly
    float64-representable (doubles, or integers with |v| < 2⁵³) for
    the bucket-boundary comparisons to be exact — int64 key columns
    beyond 2⁵³ would need an integer-edge variant."""
    vals_ds = ds.select_columns([col]).materialize()
    n = vals_ds.count()
    if n == 0:
        raise ValueError("exact_quantiles over an empty dataset")

    from ray.data.aggregate import Max, Min

    agg = vals_ds.aggregate(Min(col), Max(col))
    gmin, gmax = float(agg[f"min({col})"]), float(agg[f"max({col})"])

    # rank(q) must replicate the oracle exactly: same double multiply,
    # same ceil
    targets = {q: min(max(math.ceil(q * n) - 1, 0), n - 1) for q in qs}
    # open intervals: q -> [lo, hi] inclusive, below = #values < lo,
    # count = #values in [lo, hi]
    state = {q: {"lo": gmin, "hi": gmax, "below": 0, "count": n} for q in qs}
    result: dict[float, float] = {}

    def _finalize(ready: list) -> None:
        """ONE shared streaming pass selects every ready quantile's
        element (intervals tagged per value, split on the driver)."""
        ivs = []
        for q in ready:
            st = state.pop(q)
            if st["lo"] == st["hi"]:
                result[q] = st["lo"]
            else:
                ivs.append((q, st["lo"], st["hi"], targets[q] - st["below"]))
        if not ivs:
            return

        def grab(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            vals_parts, tag_parts = [], []
            for i, (_, lo, hi, _w) in enumerate(ivs):
                sel = v[(v >= lo) & (v <= hi)]
                vals_parts.append(sel)
                tag_parts.append(np.full(len(sel), i, dtype=np.int8))
            return pa.table(
                {
                    col: pa.array(np.concatenate(vals_parts)),
                    "qi": pa.array(np.concatenate(tag_parts), pa.int8()),
                }
            )

        vp, tp = [], []
        for b in vals_ds.map_batches(
            grab, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            vp.append(b.column(col).to_numpy(zero_copy_only=False))
            tp.append(b.column("qi").to_numpy(zero_copy_only=False))
        allv, allt = np.concatenate(vp), np.concatenate(tp)
        for i, (q, _lo, _hi, want) in enumerate(ivs):
            arr = np.sort(allv[allt == i])
            result[q] = float(arr[want])

    for _ in range(max_rounds):
        _finalize(
            [q for q, st in state.items() if st["count"] <= collect_limit or st["lo"] == st["hi"]]
        )
        if not state:
            break
        open_qs = sorted(state)
        edges = np.stack(
            [np.linspace(state[q]["lo"], state[q]["hi"], num_buckets + 1) for q in open_qs]
        )  # (Q, B+1)

        def count_stage(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            flat = np.zeros(len(open_qs) * num_buckets, dtype=np.int64)
            for i in range(len(open_qs)):
                e = edges[i]
                inb = v[(v >= e[0]) & (v <= e[-1])]
                idx = np.clip(np.searchsorted(e, inb, side="right") - 1, 0, num_buckets - 1)
                flat[i * num_buckets : (i + 1) * num_buckets] = np.bincount(
                    idx, minlength=num_buckets
                )
            off = pa.array([0, len(flat)], pa.int32())
            return pa.table(
                {"counts": pa.ListArray.from_arrays(off, pa.array(flat, pa.int64()))}
            )

        partials = vals_ds.map_batches(
            count_stage, batch_format="pyarrow", zero_copy_batch=True
        )
        total = np.zeros(len(open_qs) * num_buckets, dtype=np.int64)
        for b in partials.iter_batches(batch_format="pyarrow", batch_size=1 << 10):
            for lst in b.column("counts").to_pylist():
                total += np.asarray(lst, dtype=np.int64)

        for i, q in enumerate(open_qs):
            st = state[q]
            cnt = total[i * num_buckets : (i + 1) * num_buckets]
            cum = np.cumsum(cnt)
            want = targets[q] - st["below"]
            b = int(np.searchsorted(cum, want, side="right"))
            e = edges[i]
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            st["below"] += int(cum[b - 1]) if b else 0
            st["count"] = int(cnt[b])
            if not (new_hi > new_lo) or st["count"] == 0:
                # degenerate at double precision — everything in this
                # bucket is one representable value
                st["lo"] = st["hi"] = new_lo
            else:
                st["lo"], st["hi"] = new_lo, new_hi

    _finalize(list(state))
    return result


def quantiles_table(ds, *, col: str, qs: tuple[float, ...], names: tuple[str, ...]):
    """exact_quantiles as a one-row pyarrow Table (named columns)."""
    res = exact_quantiles(ds, col=col, qs=qs)
    return pa.table({nm: pa.array([res[q]], pa.float64()) for nm, q in zip(names, qs)})


def equi_depth_splits(ds, *, col: str, num_buckets: int, **kw) -> np.ndarray:
    """B−1 ascending split values (actual column elements, via
    :func:`exact_quantiles`) such that ``np.searchsorted(splits, v,
    side="right")`` assigns rows to ``num_buckets`` ORDER-PRESERVING,
    equi-depth range buckets — balanced under any value skew, unlike
    equal-width ranges. This is the quantile-sketch partitioner the
    packing scan's docstring calls for on skewed id spaces."""
    if num_buckets <= 1:
        return np.empty(0, dtype=np.float64)
    qs = tuple(i / num_buckets for i in range(1, num_buckets))
    res = exact_quantiles(ds, col=col, qs=qs, **kw)
    return np.asarray([res[q] for q in qs], dtype=np.float64)
