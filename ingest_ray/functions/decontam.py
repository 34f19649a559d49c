"""Benchmark decontamination: flag corpus documents that share any
word n-gram with a benchmark/blocklist corpus.

The standard LLM-training hygiene step (remove eval-set text from the
training corpus). Two execution paths, auto-selected by blocklist
size:

* **broadcast** (the common case — benchmarks are tiny next to a
  100 TB corpus): the blocklist's distinct n-gram hashes are collected
  once, sorted, ``ray.put`` into the object store, and every corpus
  batch probes them with one ``np.searchsorted`` — zero shuffles, one
  streaming pass over the corpus.
* **distributed** (blocklist too big for one node's heap): explode
  BOTH sides to (gram-hash, doc_id) rows, hash-bucket ONE groupby over
  the gram hash, and emit per-bucket (doc_id, hit) rows where a bench
  marker shares the bucket; a second small groupby folds per-doc hit
  counts. Cost is two exchanges of the exploded grams — linear, never
  all-pairs.

N-grams are hashed (``hash64_str`` over the space-joined window) —
64-bit collisions are negligible at any realistic blocklist size and
hashing is what the 10^12-doc deployment ships (shipping raw gram
strings through an exchange would multiply bytes by the window width).

Output: one row per contaminated document — ``doc_id``, ``n_hits``
(number of DISTINCT n-grams of that doc found in the blocklist).
Clean documents are absent (the caller anti-joins to drop or keep).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash64_arrow

OUT_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("n_hits", pa.int64())]
)


def _gram_hashes(batch: pa.Table, n: int, text_col: str = "text"):
    """batch → (doc_row_idx int64[], gram_hash uint64[]) for every
    word n-gram, vectorized: one split, one join per window offset."""
    toks = pc.split_pattern(batch.column(text_col).combine_chunks(), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    n_grams = np.maximum(lens - n + 1, 0)
    total = int(n_grams.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    run_start = np.cumsum(n_grams) - n_grams
    within = np.arange(total, dtype=np.int64) - np.repeat(run_start, n_grams)
    # token index of each gram's first word, in the FLAT token buffer
    tok_offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    first = tok_offs[row_of] + within
    flat_toks = toks.values  # StringArray of all tokens
    # build each gram's string with ONE take + binary_join per batch:
    # indices laid out gram-major [g0w0..g0w{n-1}, g1w0..]
    idx = (first[:, None] + np.arange(n, dtype=np.int64)[None, :]).ravel()
    words = flat_toks.take(pa.array(idx, pa.int64()))
    goffs = pa.array(np.arange(total + 1, dtype=np.int32) * n, pa.int32())
    gram_lists = pa.ListArray.from_arrays(goffs, words)
    grams = pc.binary_join(gram_lists, " ")
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return row_of, hash64_arrow(grams)


def blocklist_hashes(bench_ds, n: int = 8, text_col: str = "text") -> np.ndarray:
    """Distinct, sorted n-gram hashes of the benchmark corpus.

    Per-batch distinct happens inside the map (bounded output), the
    global distinct on the driver — the blocklist is small by contract
    of the broadcast path; :func:`decontaminate` falls back to the
    distributed path when it is not."""

    def stage(batch: pa.Table) -> pa.Table:
        _, h = _gram_hashes(batch, n, text_col)
        return pa.table({"g": pa.array(np.unique(h), pa.uint64())})

    parts = bench_ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    chunks = [
        b.column("g").to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks))


def decontaminate(
    docs_ds,
    bench_ds,
    n: int = 8,
    text_col: str = "text",
    doc_col: str = "doc_id",
    broadcast_doc_limit: int = 1_000_000,
    num_buckets: int = 64,
):
    """Corpus × blocklist n-gram overlap → (doc_id, n_hits) rows for
    every contaminated document (n_hits = distinct matching grams).

    Auto-selects broadcast vs distributed on the blocklist's DOCUMENT
    count (metadata-cheap, checked BEFORE any driver collect) vs
    ``broadcast_doc_limit`` — 1M benchmark docs ≈ low-hundreds of MB
    of distinct gram hashes, a per-node probe array shipped ONCE via
    ``ray.put``. Benchmarks at corpus scale take the two-exchange
    distributed path instead."""
    import ray

    if bench_ds.count() <= broadcast_doc_limit:
        bl = blocklist_hashes(bench_ds, n, text_col)
        bl_ref = ray.put(bl)

        def probe(batch: pa.Table) -> pa.Table:
            blk = ray.get(bl_ref)
            row_of, h = _gram_hashes(batch, n, text_col)
            ids = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(h) == 0 or len(blk) == 0:
                return OUT_SCHEMA.empty_table()
            pos = np.searchsorted(blk, h)
            hit = (pos < len(blk)) & (blk[np.minimum(pos, len(blk) - 1)] == h)
            if not hit.any():
                return OUT_SCHEMA.empty_table()
            # distinct (doc, gram) hits within the batch
            dr, dh = row_of[hit], h[hit]
            so = np.lexsort((dh, dr))
            keep = np.empty(len(so), dtype=bool)
            keep[0] = True
            keep[1:] = (dr[so][1:] != dr[so][:-1]) | (dh[so][1:] != dh[so][:-1])
            uids, counts = np.unique(dr[so][keep], return_counts=True)
            return pa.table(
                {
                    "doc_id": pa.array(ids[uids], pa.int64()),
                    "n_hits": pa.array(counts.astype(np.int64), pa.int64()),
                }
            ).cast(OUT_SCHEMA)

        # a doc's grams never split across batches, so per-batch rows
        # are already per-doc totals — no downstream aggregate needed
        return docs_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # -- distributed path: blocklist itself is corpus-scale ------------
    GRAM_SCHEMA = pa.schema(
        [
            pa.field("g", pa.uint64()),
            pa.field("doc_id", pa.int64()),
            pa.field("is_bench", pa.bool_()),
            pa.field("bucket", pa.int32()),
        ]
    )

    def explode(is_bench: bool):
        def stage(batch: pa.Table) -> pa.Table:
            row_of, h = _gram_hashes(batch, n, text_col)
            if is_bench:
                h = np.unique(h)
                ids = np.full(len(h), -1, dtype=np.int64)
            else:
                ids_all = (
                    batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
                )
                # per-doc distinct grams (bounds the exchange)
                so = np.lexsort((h, row_of))
                keepm = np.empty(len(so), dtype=bool)
                if len(so):
                    keepm[0] = True
                    keepm[1:] = (row_of[so][1:] != row_of[so][:-1]) | (
                        h[so][1:] != h[so][:-1]
                    )
                sel = so[keepm] if len(so) else so
                h, ids = h[sel], ids_all[row_of[sel]]
            bucket = (h % np.uint64(num_buckets)).astype(np.int32)
            return pa.table(
                {
                    "g": pa.array(h, pa.uint64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "is_bench": pa.array(np.full(len(h), is_bench)),
                    "bucket": pa.array(bucket, pa.int32()),
                }
            ).cast(GRAM_SCHEMA)

        return stage

    both = docs_ds.map_batches(
        explode(False), batch_format="pyarrow", zero_copy_batch=True
    ).union(bench_ds.map_batches(explode(True), batch_format="pyarrow", zero_copy_batch=True))

    HIT_SCHEMA = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_hits", pa.int64())]
    )

    def per_bucket(df) -> pa.Table:
        g = df["g"].to_numpy()
        bench_mask = df["is_bench"].to_numpy()
        bench_g = np.unique(g[bench_mask])
        cg = g[~bench_mask]
        cid = df["doc_id"].to_numpy()[~bench_mask].astype(np.int64)
        if len(bench_g) == 0 or len(cg) == 0:
            return HIT_SCHEMA.empty_table()
        pos = np.searchsorted(bench_g, cg)
        hit = (pos < len(bench_g)) & (bench_g[np.minimum(pos, len(bench_g) - 1)] == cg)
        if not hit.any():
            return HIT_SCHEMA.empty_table()
        uids, counts = np.unique(cid[hit], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_hits": pa.array(counts.astype(np.int64), pa.int64()),
            }
        ).cast(HIT_SCHEMA)

    hits = both.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    from ray.data.aggregate import Sum

    return (
        hits.groupby("doc_id")
        .aggregate(Sum("n_hits", alias_name="n_hits"))
        .select_columns(["doc_id", "n_hits"])
    )
