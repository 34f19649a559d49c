"""Distributed cardinality statistics: exact distinct count and a
HyperLogLog sketch.

The reference's only distinct operator is the blob-offset HashSet dedup
inside its join pushdowns (/root/reference/src/denorm.rs:123-131); this
module exposes cardinality as a first-class operator with the two plans
a 100 TB corpus needs:

* :func:`distinct_count` — EXACT: per-batch pre-dedup (cuts the wire to
  the batch's distinct keys), one hash-bucket exchange, per-bucket
  unique count, driver sums ``num_buckets`` scalars. The only driver
  traffic is one int per bucket.
* :func:`hll_count` — APPROXIMATE (±~1.04/√2ᵖ): per-batch register
  partials, one bounded groupby max-merge, driver folds ≤
  ``num_reduce_buckets`` register rows. Register size is 2ᵖ bytes no
  matter how large the corpus grows — the scale path when an exact
  answer isn't required.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import splitmix64


def distinct_count(ds, col: str, *, num_buckets: int = 64) -> int:
    """Exact COUNT(DISTINCT col) over integral keys."""

    def key_stage(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64))
        bk = (splitmix64(keys.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {"bucket": pa.array(bk, pa.int32()), "k": pa.array(keys, pa.int64())}
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        n = len(np.unique(t.column("k").to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "bucket": pa.array([int(t.column("bucket")[0].as_py())], pa.int32()),
                "n": pa.array([n], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(key_stage, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    total = 0
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += int(np.sum(b.column("n").to_numpy(zero_copy_only=False), initial=0))
    return total


def _hll_partial(keys: np.ndarray, p: int) -> np.ndarray:
    """Max rank-of-leading-zeros per register over hashed keys."""
    m = 1 << p
    h = splitmix64(keys.astype(np.uint64))
    reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of the remaining 64-p bits, + 1 (capped)
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    nz = rest != 0
    # position of highest set bit via float log2 is unsafe at 64 bits;
    # use a 4-step binary search on integers instead
    r = rest[nz]
    shift = np.zeros(len(r), dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        mask = r < (np.uint64(1) << np.uint64(64 - s))
        r = np.where(mask, r << np.uint64(s), r)
        shift = shift + np.where(mask, np.uint8(s), np.uint8(0)).astype(np.uint8)
    lz[nz] = shift
    rank = np.minimum(lz.astype(np.int64) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, reg_idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    raw = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(raw)


def hll_count(ds, col: str, *, p: int = 14, num_reduce_buckets: int = 32) -> float:
    """HyperLogLog cardinality estimate over integral keys. Registers
    merge by elementwise max — associative and idempotent, so the
    groupby tree-reduce and retried tasks are both safe."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        regs = _hll_partial(keys, p)
        # route by batch CONTENT, not length — equal-sized batches would
        # otherwise all collide into one reduce group
        seed = np.uint64(keys[0]) ^ np.uint64(len(keys)) if len(keys) else np.uint64(0)
        bk = int(splitmix64(seed) % num_reduce_buckets)
        return pa.table(
            {
                "bucket": pa.array([bk], pa.int32()),
                "regs": pa.array([regs.tobytes()], pa.binary()),
            }
        )

    def max_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(m, dtype=np.uint8)
        for chunk in t.column("regs").to_pylist():
            np.maximum(acc, np.frombuffer(chunk, dtype=np.uint8), out=acc)
        return pa.table(
            {
                "bucket": pa.array([int(t.column("bucket")[0].as_py())], pa.int32()),
                "regs": pa.array([acc.tobytes()], pa.binary()),
            }
        )

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(max_group, batch_format="pyarrow")
    )
    acc = np.zeros(m, dtype=np.uint8)
    for b in reduced.iter_batches(batch_size=None, batch_format="pyarrow"):
        for chunk in b.column("regs").to_pylist():
            np.maximum(acc, np.frombuffer(chunk, dtype=np.uint8), out=acc)
    return _hll_estimate(acc, p)


# --------------------------------------------------------------------------
# frequent items — exact (combiner groupby) and Misra-Gries sketch
# --------------------------------------------------------------------------

HH_SCHEMA = pa.schema([pa.field("v", pa.int64()), pa.field("n", pa.int64())])


def exact_heavy_hitters(ds, col: str, *, min_count: int):
    """All values with total count ≥ ``min_count`` — per-batch
    pre-aggregated counts (the combiner), ONE small groupby over
    (value, partial_count), filter. The exchange carries one row per
    (value, batch), never one per input row."""

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"v": pa.array(vals, pa.int64()), "n": pa.array(cnts.astype(np.int64), pa.int64())}
        )

    from ray.data.aggregate import Sum

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "v": batch.column("v").cast(pa.int64()),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )
        return t.filter(pc.greater_equal(t.column("n"), min_count))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("n"))
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )


def _mg_compress(vals: np.ndarray, cnts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Keep ≤ k counters by subtracting the (k+1)-th largest count from
    all (the Misra-Gries decrement); returns the amount subtracted."""
    if len(vals) <= k:
        return vals, cnts, 0
    d = int(np.partition(cnts, -(k + 1))[-(k + 1)])
    keep = cnts > d
    return vals[keep], (cnts[keep] - d), d


def _mg_sum_by_value(vals: np.ndarray, cnts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], cnts[order]
    starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
    return v[starts], np.add.reduceat(c, starts)


def heavy_hitters(
    ds, col: str, *, k: int = 1024, num_reduce_buckets: int = 32
) -> pa.Table:
    """Misra-Gries frequent-items sketch (Agarwal et al., "Mergeable
    Summaries"): each batch compresses its exact counts to ≤ k
    counters, summaries merge by count-sum + re-compress (any merge
    tree keeps the bound), so the exchange is ≤ k rows per batch and
    the driver folds ≤ ``num_reduce_buckets`` summaries. Returns
    (v, n_lo, n_hi): true count ∈ [n_lo, n_hi] and every value whose
    true count exceeds the accumulated decrement (≤ N/(k+1)) is
    PRESENT — no false negatives above that threshold. The exact twin
    is :func:`exact_heavy_hitters`."""

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        vals, cnts, d = _mg_compress(vals, cnts.astype(np.int64), k)
        seed = np.uint64(vals[0]) ^ np.uint64(len(batch)) if len(vals) else np.uint64(0)
        bk = int(splitmix64(seed) % num_reduce_buckets)
        n = len(vals)
        return pa.table(
            {
                "bucket": pa.array(np.full(n + 1, bk, dtype=np.int32), pa.int32()),
                "flag": pa.array(
                    np.concatenate([np.zeros(n, dtype=np.int8), [1]]), pa.int8()
                ),
                "v": pa.array(np.concatenate([vals, [0]]), pa.int64()),
                "c": pa.array(np.concatenate([cnts, [d]]), pa.int64()),
            }
        )

    def merge_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray, int]:
        flag = t.column("flag").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        err = int(c[flag == 1].sum())
        vv, cc = _mg_sum_by_value(v[flag == 0], c[flag == 0])
        vv, cc, d = _mg_compress(vv, cc, k)
        return vv, cc, err + d

    def per_bucket(t: pa.Table) -> pa.Table:
        vv, cc, err = merge_rows(t)
        bk = int(t.column("bucket")[0].as_py()) if len(t) else 0
        n = len(vv)
        return pa.table(
            {
                "bucket": pa.array(np.full(n + 1, bk, dtype=np.int32), pa.int32()),
                "flag": pa.array(
                    np.concatenate([np.zeros(n, dtype=np.int8), [1]]), pa.int8()
                ),
                "v": pa.array(np.concatenate([vv, [0]]), pa.int64()),
                "c": pa.array(np.concatenate([cc, [err]]), pa.int64()),
            }
        )

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    rows = pa.concat_tables(
        list(reduced.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    vv, cc, err = merge_rows(rows)
    order = np.argsort(-cc, kind="stable")
    vv, cc = vv[order], cc[order]
    return pa.table(
        {
            "v": pa.array(vv, pa.int64()),
            "n_lo": pa.array(cc, pa.int64()),
            "n_hi": pa.array(cc + err, pa.int64()),
        }
    )
