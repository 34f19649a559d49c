"""Shared low-level helpers: varints, deterministic hashing, f32 math.

The varint codec is the LEB128-style unsigned varint used by the
georender payload layout (reference: /root/reference/src/value.rs:27-38
reads the feature header as varint/byte/varint/varint).
"""

from __future__ import annotations

import numpy as np

U64_MASK = 0xFFFFFFFFFFFFFFFF


def varint_encode(value: int, out: bytearray) -> None:
    """Append unsigned LEB128 varint bytes of ``value`` to ``out``."""
    v = int(value)
    if v < 0:
        raise ValueError("varint_encode takes unsigned values")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def varint_decode(buf: bytes, offset: int = 0) -> tuple[int, int]:
    """Decode one varint from ``buf`` at ``offset`` → (value, new_offset)."""
    result = 0
    shift = 0
    while True:
        b = buf[offset]
        offset += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, offset
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """Deterministic 64-bit mix (public splitmix64 finalizer).

    Vectorized over uint64 numpy arrays; used for seeded synthesis and
    salting — never Python's ``random`` module (reproducibility).
    """
    scalar = np.isscalar(x)
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(U64_MASK)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(U64_MASK)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(U64_MASK)
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z


def hash64_str(arr) -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of an iterable of strings → uint64.

    Used for content hashes (exact dedup) and salt derivation. Stable
    across processes (unlike Python's ``hash``).

    Vectorized across strings: one numpy pass per byte POSITION over
    the still-active strings (total work stays O(total bytes) but the
    inner loop is C, not a per-byte Python loop — the scalar form was
    the hot spot of exact dedup / simhash / shingling). Byte-identical
    to the scalar FNV-1a (unit-tested).
    """
    n = len(arr)
    if n == 0:
        return np.full(0, np.uint64(0xCBF29CE484222325))
    data = [s.encode("utf-8", "surrogatepass") for s in arr]
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(data), dtype=np.uint8)
    return _fnv1a_flat(flat, np.cumsum(lens) - lens, lens)


def hash64_arrow(arr) -> np.ndarray:
    """FNV-1a over an Arrow string/binary array — same values as
    :func:`hash64_str`, but the utf-8 bytes come zero-copy from the
    Arrow buffers (no per-row encode)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    return _fnv1a_flat(data, offs[:-1].astype(np.int64), np.diff(offs).astype(np.int64))


def _fnv1a_flat(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    n = len(lens)
    out = np.full(n, np.uint64(0xCBF29CE484222325))
    if n == 0:
        return out
    max_len = int(lens.max())
    if max_len == 0:
        return out
    prime = np.uint64(0x100000001B3)
    # iterate positions over strings sorted by length: after sorting,
    # the active set at position p is a PREFIX slice — no boolean mask
    # re-evaluation per iteration
    order = np.argsort(-lens, kind="stable")
    s_starts = starts[order]
    s_lens = lens[order]
    h = out[order].copy()
    with np.errstate(over="ignore"):
        for p in range(max_len):
            k = int(np.searchsorted(-s_lens, -p, side="left"))  # len > p
            if k == 0:
                break
            idx = s_starts[:k] + p
            h[:k] = (h[:k] ^ flat[idx]) * prime
    out[order] = h
    return out


def hash64_bytes_np(data: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash of fixed-width uint64 columns (xor-mix)."""
    return splitmix64(np.asarray(data, dtype=np.uint64))


def cluster_cpus(default: int = 8) -> int:
    """Logical CPUs of the connected Ray cluster (``default`` if unknown)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def tune_shuffle_context() -> None:
    """Size hash-shuffle/join aggregator pools for the current cluster.

    Ray 2.49's JoinOperator reserves an actor pool per join
    (``num_partitions`` aggregators, each with its own CPU+memory
    demand). In local mode the cluster-config fallback over-allocates:
    several concurrent joins deadlock an 8-CPU node (observed: reads
    backpressured forever). One pool should cost ≤ ~1/8 of the
    cluster, so per-partition CPU = (cpus/8)/partitions, floored.
    Idempotent; respects values the user already set.
    """
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    if ctx.join_operator_actor_num_cpus_per_partition_override is None:
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.0625
    if ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override is None:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0625


def effective_num_partitions(requested: int, min_parts: int = 2) -> int:
    """Cap a shuffle/join partition count by cluster size.

    At planet scale ``requested`` (hundreds+) wins; on a small local
    cluster the cap keeps aggregator pools schedulable.
    """
    return max(min_parts, min(requested, cluster_cpus()))


def maybe_cache_projection(ds, cols, store_fraction: float = 0.25):
    """For ITERATIVE operators (k-means, k-center) that stream the same
    input once per round: materialize the pruned projection ONCE when
    it provably fits ``store_fraction`` of the object store, so later
    rounds read plasma instead of re-decoding parquet per round.

    The estimate is cheap and safe: row count from dataset metadata
    (O(1) for pure parquet reads), bytes/row sampled from one 256-row
    batch — nothing big is materialized before the bound is proven.
    Any failure (no metadata, empty input, no store figure) falls back
    to returning ``ds`` unchanged — the streaming re-read, which is
    also the correct 10¹²-row path where no projection fits."""
    import ray as _ray

    try:
        proj = ds.select_columns(list(cols))
        n = ds.count()
        if not n:
            return ds
        first = next(
            iter(
                proj.limit(min(256, n)).iter_batches(
                    batch_size=256, batch_format="pyarrow"
                )
            )
        )
        if len(first) == 0:
            return ds
        bpr = first.nbytes / len(first)
        cap = _ray.cluster_resources().get("object_store_memory", 0)
        if cap and n * bpr < store_fraction * cap:
            return proj.materialize()
    except Exception:
        pass
    return ds


def sever_lineage(materialized_ds):
    """MaterializedDataset → fresh Dataset over the same Arrow block
    refs (zero-copy), with a length-1 logical plan.

    Ray 2.49's ``materialize()`` caches the blocks but KEEPS the full
    logical plan, so a loop of the form ``ds = f(ds).materialize()``
    builds a plan that grows every round — with two consumers per round
    it DOUBLES, and planning time with it (measured: a 15-round
    union+groupby loop goes 0.3 s → 86 s per round with constant block
    counts; rebasing on the block refs holds it at 0.3 s). Call this on
    every loop-carried materialized dataset.

    Fault-tolerance tradeoff (explicit): the rebased dataset has no
    lineage, so a lost block is NOT recomputed — consumers fail loudly
    (pinned by ``test_sever_lineage_block_loss_fails_loudly``), never
    silently drop rows. Recompute story for loop-carried state: the
    loop's INPUTS (upstream of the first sever) keep their lineage and
    every round is deterministic, so the caller retries the whole loop
    (label propagation, k-means rounds are idempotent); at 10¹²-doc
    scale, per-round outputs are small assignment tables, so callers
    that need finer-grained resume can parquet-checkpoint a round the
    same way ``checkpoint.staged_ingest`` commits stages.
    """
    import ray.data as rd

    return rd.from_arrow_refs(materialized_ds.to_arrow_refs())
