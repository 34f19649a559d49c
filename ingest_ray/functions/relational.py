"""Semi / anti joins — distributed EXISTS / NOT EXISTS.

The reference engine expresses existence checks as offset-pushdown
semi-joins inside its denormalize passes (/root/reference/src/lib.rs
way/relation batch loops); this module exposes the same primitive as a
user-facing operator over arbitrary tables.

Two plans, threshold-gated like the rest of the repo's join family:

* **broadcast** (right side's distinct keys ≤ ``broadcast_limit``):
  one distinct-aggregate over the right key, the sorted key array is
  ``ray.put`` ONCE, and every left batch filters by searchsorted
  membership — the left side never shuffles.
* **distributed** (beyond the limit): both sides tag and bucket by
  ``hash(key)``; one groupby per bucket keeps/drops left rows by a
  sorted-membership test against the bucket's right keys. Two hash
  exchanges total, no driver materialization.

Both plans are property-tested equal; keys must be integral (the
testdata and reference key model).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import splitmix64


def _distinct_right_keys(right_ds, right_key: str, limit: int) -> np.ndarray | None:
    """Sorted distinct int64 key array via per-batch pre-dedup +
    driver merge — ONE execution of the right-side pipeline. Returns
    None (abort) as soon as the accumulated distinct count exceeds
    ``limit``, so an over-limit right side costs one partial scan,
    not a full collect."""
    parts: list[np.ndarray] = []
    total = 0
    for b in right_ds.select_columns([right_key]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        u = np.unique(b.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64))
        parts.append(u)
        total += len(u)
        if total > 2 * limit:  # re-merge (dedup across batches) before judging
            parts = [np.unique(np.concatenate(parts))]
            total = len(parts[0])
            if total > limit:
                return None
    if not parts:
        return np.empty(0, dtype=np.int64)
    out = np.unique(np.concatenate(parts))
    return out if len(out) <= limit else None


def _member_mask(keys: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if not len(sorted_set):
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(sorted_set, keys)
    pos_c = np.clip(pos, 0, len(sorted_set) - 1)
    return (pos < len(sorted_set)) & (sorted_set[pos_c] == keys)


def _exists_join(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    keep_if_exists: bool,
    broadcast_limit: int = 50_000_000,
    num_buckets: int = 64,
):
    import ray

    # gate on DISTINCT right keys (what actually broadcasts), not raw
    # row count: one streaming pass with an early abort past the limit
    keys = _distinct_right_keys(right_ds, right_key, broadcast_limit) if broadcast_limit else None

    if keys is not None:
        key_ref = ray.put(keys)

        def filter_batch(batch: pa.Table) -> pa.Table:
            keys = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = _member_mask(keys, ray.get(key_ref))
            return batch.filter(pa.array(hit if keep_if_exists else ~hit))

        return left_ds.map_batches(
            filter_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    # distributed plan: union tagged key rows, one membership groupby
    left_schema = left_ds.schema()
    out_schema = pa.schema(list(zip(left_schema.names, left_schema.types)))
    carry = [c for c in left_schema.names if c != left_key]
    wire_schema = pa.schema(
        [pa.field(left_key, pa.int64()), pa.field("__side", pa.int8())]
        + [pa.field(c, t) for c, t in zip(left_schema.names, left_schema.types) if c != left_key]
        + [pa.field("__bucket", pa.int32())]
    )

    def _bucket(keys: np.ndarray) -> pa.Array:
        return pa.array(
            (splitmix64(keys.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32),
            pa.int32(),
        )

    def left_side(batch: pa.Table) -> pa.Table:
        keys = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            left_key: pa.array(keys, pa.int64()),
            "__side": pa.array(np.zeros(len(keys), dtype=np.int8), pa.int8()),
        }
        for c in carry:
            cols[c] = batch.column(c)
        cols["__bucket"] = _bucket(keys)
        return pa.table(cols).cast(wire_schema)

    def right_side(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        cols = {
            left_key: pa.array(keys, pa.int64()),
            "__side": pa.array(np.ones(len(keys), dtype=np.int8), pa.int8()),
        }
        for c, t in zip(left_schema.names, left_schema.types):
            if c != left_key:
                cols[c] = pa.nulls(len(keys), t)
        cols["__bucket"] = _bucket(keys)
        return pa.table(cols).cast(wire_schema)

    tagged = left_ds.map_batches(
        left_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(right_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        side = t.column("__side").to_numpy(zero_copy_only=False)
        keys = t.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        right_set = np.unique(keys[side == 1])
        left_rows = np.flatnonzero(side == 0)
        hit = _member_mask(keys[left_rows], right_set)
        sel = left_rows[hit] if keep_if_exists else left_rows[~hit]
        return t.take(pa.array(sel, pa.int64())).select(out_schema.names).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def semi_join(left_ds, right_ds, *, left_key: str, right_key: str, **kw):
    """Left rows with ≥1 right-side key match (distributed EXISTS)."""
    return _exists_join(
        left_ds, right_ds, left_key=left_key, right_key=right_key, keep_if_exists=True, **kw
    )


def anti_join(left_ds, right_ds, *, left_key: str, right_key: str, **kw):
    """Left rows with NO right-side key match (distributed NOT EXISTS)."""
    return _exists_join(
        left_ds, right_ds, left_key=left_key, right_key=right_key, keep_if_exists=False, **kw
    )


# --------------------------------------------------------------------------
# bloom-filter pre-filtered variants — the 100 TB left-side path
# --------------------------------------------------------------------------


def _bloom_params(num_bits: int, num_hashes: int) -> tuple[int, int]:
    nb = 1 << int(num_bits).bit_length() - 1 if num_bits & (num_bits - 1) else num_bits
    return int(nb), int(num_hashes)


def _bloom_positions(keys: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """k hash positions per key via iterated splitmix64 (shape n×k)."""
    h = keys.astype(np.uint64)
    out = np.empty((len(keys), num_hashes), dtype=np.int64)
    for i in range(num_hashes):
        h = splitmix64(h)
        out[:, i] = (h % np.uint64(num_bits)).astype(np.int64)
    return out


def build_bloom(right_ds, right_key: str, *, num_bits: int = 1 << 24, num_hashes: int = 4,
                num_reduce_buckets: int = 32):
    """Distributed Bloom filter over ``right_key``: per-batch partial
    bit arrays → one small groupby OR-reduce (≤ ``num_reduce_buckets``
    rows of ``num_bits/8`` bytes reach the driver — the reduce never
    scales with the corpus). Returns the bit array (uint8)."""
    nb, k = _bloom_params(num_bits, num_hashes)

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        bits = np.zeros(nb >> 3, dtype=np.uint8)
        if len(keys):
            pos = _bloom_positions(keys, nb, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        bk = int(splitmix64(np.uint64(len(keys) and int(keys[0]) or 0)) % num_reduce_buckets)
        return pa.table(
            {
                "bucket": pa.array([bk], pa.int32()),
                "bits": pa.array([bits.tobytes()], pa.binary()),
            }
        )

    def or_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(nb >> 3, dtype=np.uint8)
        for chunk in t.column("bits").to_pylist():
            acc |= np.frombuffer(chunk, dtype=np.uint8)
        return pa.table(
            {
                "bucket": pa.array([int(t.column("bucket")[0].as_py())], pa.int32()),
                "bits": pa.array([acc.tobytes()], pa.binary()),
            }
        )

    reduced = (
        right_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(or_group, batch_format="pyarrow")
    )
    acc = np.zeros(nb >> 3, dtype=np.uint8)
    for b in reduced.iter_batches(batch_size=None, batch_format="pyarrow"):
        for chunk in b.column("bits").to_pylist():
            acc |= np.frombuffer(chunk, dtype=np.uint8)
    return acc


def _bloom_maybe_mask(keys: np.ndarray, bits: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """True where the key MIGHT be in the set (no false negatives)."""
    maybe = np.ones(len(keys), dtype=bool)
    h = keys.astype(np.uint64)
    for _ in range(num_hashes):
        h = splitmix64(h)
        pos = (h % np.uint64(num_bits)).astype(np.int64)
        maybe &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
    return maybe


def semi_join_bloom(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 24,
    num_hashes: int = 4,
    **kw,
):
    """EXACT semi join with a Bloom pre-filter: the left side is cut to
    bloom-maybe rows BEFORE the exchange, then the exact
    :func:`semi_join` verifies the survivors (false positives die
    there; false negatives are impossible). At planet scale this is
    the difference between shuffling the whole left table and shuffling
    ~``|match| + fp·|left|`` rows — the filter itself is ``num_bits``
    BITS however large the right side grows. Property-tested equal to
    :func:`semi_join`."""
    import ray

    nb, k = _bloom_params(num_bits, num_hashes)
    bits_ref = ray.put(build_bloom(right_ds, right_key, num_bits=nb, num_hashes=k))

    def prefilter(batch: pa.Table) -> pa.Table:
        keys = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_bloom_maybe_mask(keys, ray.get(bits_ref), nb, k)))

    maybe = left_ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return semi_join(maybe, right_ds, left_key=left_key, right_key=right_key, **kw)


def anti_join_bloom(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 24,
    num_hashes: int = 4,
    **kw,
):
    """EXACT anti join with a Bloom short-circuit: bloom-negative left
    rows are DEFINITE non-members and pass straight through (zero
    exchange); only bloom-maybe rows ride the exact :func:`anti_join`
    to kill false positives. Property-tested equal to
    :func:`anti_join`."""
    import ray

    nb, k = _bloom_params(num_bits, num_hashes)
    bits_ref = ray.put(build_bloom(right_ds, right_key, num_bits=nb, num_hashes=k))

    def split(keep_maybe: bool):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
            m = _bloom_maybe_mask(keys, ray.get(bits_ref), nb, k)
            return batch.filter(pa.array(m if keep_maybe else ~m))

        return fn

    definite = left_ds.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    maybe = left_ds.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)
    verified = anti_join(maybe, right_ds, left_key=left_key, right_key=right_key, **kw)
    return definite.union(verified)
