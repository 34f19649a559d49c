"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each documented per function): exact dedup and the LSH
band buckets are hash-partitioned groupbys (shuffle only the keys +
compact sketches, never full texts where avoidable); the all-pairs
variants exist as *oracle-checkable* ground truth at test scale and
state their quadratic cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import hash64_str, splitmix64
from .text import _WS, shingles

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """Group by exact text → (keep_id = min doc_id, dup_count).

    Pattern: content hash in a vectorized map_batches, then a groupby
    over (hash) with per-group first — the hash-partition + per-group
    first of SURVEY.md §2.5 O3. Texts never shuffle; only (hash,
    doc_id) pairs do.
    """
    import pyarrow.compute as pc

    def hash_stage(batch: pa.Table) -> pa.Table:
        h = hash64_str(batch.column("text").to_pylist())
        return pa.table(
            {
                "text_hash": pa.array(h, pa.uint64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    hashed = docs_ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count, Min

    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="dup_count")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MINHASH_SEEDS = np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)


def minhash_signature(sh: set[int], num_hashes: int = 64) -> np.ndarray:
    if not sh:
        return np.full(num_hashes, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    arr = np.fromiter(sh, dtype=np.uint64)
    # one splitmix per seed: min over (shingle ^ seed) mixed
    sig = np.empty(num_hashes, dtype=np.uint64)
    for i in range(num_hashes):
        sig[i] = splitmix64(arr ^ _MINHASH_SEEDS[i]).min()
    return sig


def minhash_lsh_candidates(
    docs_ds, num_hashes: int = 64, bands: int = 16, shingle_n: int = 3
):
    """documents → candidate near-dup pairs via banded MinHash LSH.

    Stages: per-batch shingle+minhash (vectorized per doc over its
    shingles) → explode to (band_id, band_hash, doc_id) rows →
    groupby(band) → per-bucket pairs. The groupby shuffles only
    (band_hash, doc_id) — the scale path of the guide's near-dup
    recipe. Returns Dataset (a, b) with a < b, distinct.
    """
    rows_per_band = num_hashes // bands

    def sig_stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        band_ids, band_hashes, out_ids = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(shingles(t or "", shingle_n), num_hashes)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = int(splitmix64(np.bitwise_xor.reduce(chunk) ^ np.uint64(b * 1315423911)))
                band_ids.append(b)
                band_hashes.append(h)
                out_ids.append(int(doc_ids[i]))
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "bh": pa.array(np.array(band_hashes, dtype=np.uint64), pa.uint64()),
                "doc_id": pa.array(out_ids, pa.int64()),
            }
        )

    exploded = docs_ds.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = exploded.groupby(["band", "bh"]).map_groups(bucket_pairs, batch_format="pandas")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    # distinct across bands: groupby the pair key
    def key_stage(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        k = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        return batch.append_column("pk", pa.array(k, pa.uint64()))

    keyed = pairs.map_batches(key_stage, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("pk").map_groups(lambda df: df.head(1), batch_format="pandas").drop_columns(["pk"])


def verify_jaccard_pairs(pairs_ds, docs_table: pa.Table, threshold: float, shingle_n: int = 3):
    """Candidate pairs → exact shingle-Jaccard filter (broadcast texts;
    at planet scale, join texts by id instead of broadcasting)."""
    import ray

    ids = docs_table.column("doc_id").to_numpy(zero_copy_only=False)
    texts = docs_table.column("text").to_pylist()
    ref = ray.put({int(i): shingles(t or "", shingle_n) for i, t in zip(ids, texts)})

    def fn(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(a, b):
            sa, sb = sh.get(int(x), set()), sh.get(int(y), set())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 0.0
            if j >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                jac.append(j)
        return pa.table(
            {
                "a": pa.array(keep_a, pa.int64()),
                "b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return pairs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact all-pairs — oracle ground truth, O(n²) stated)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(docs_ds, docs_table: pa.Table, threshold: float = 0.5):
    """All-pairs word-set Jaccard ≥ threshold → (a, b) pairs.

    DuckDB-oracle-matched semantics: word sets are DISTINCT whitespace
    tokens of trimmed text. Quadratic by design (ground truth for the
    LSH variant); the Ray side distributes the outer loop over batches
    against a broadcast token-set table.
    """
    import ray

    ids = docs_table.column("doc_id").to_numpy(zero_copy_only=False)
    texts = docs_table.column("text").to_pylist()
    sets = [frozenset(_WS.split((t or "").strip())) if (t or "").strip() else frozenset() for t in texts]
    ref = ray.put((ids.astype(np.int64), sets))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, all_sets = ray.get(ref)
        a_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        a_texts = batch.column("text").to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(a_ids)):
            t = (a_texts[i] or "").strip()
            sa = frozenset(_WS.split(t)) if t else frozenset()
            for j in range(len(all_ids)):
                if all_ids[j] <= a_ids[i]:
                    continue
                sb = all_sets[j]
                u = len(sa | sb)
                jac = (len(sa & sb) / u) if u else 0.0
                if jac >= threshold:
                    out_a.append(int(a_ids[i]))
                    out_b.append(int(all_ids[j]))
                    out_j.append(round(jac, 6))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, simhash (uint64) — 64-bit SimHash over word hashes."""
    out = np.zeros(len(df), dtype=np.uint64)
    for i, t in enumerate(df["text"].fillna("")):
        words = _WS.split(t.strip()) if t.strip() else []
        if not words:
            continue
        hs = hash64_str(words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
        )
    return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})


def simhash_near_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup candidates: band the 64 bits into 4×16-bit
    chunks (any pair within hamming ≤3 shares ≥1 exact chunk —
    pigeonhole), groupby chunk, verify hamming exactly."""
    def sig(df: pd.DataFrame) -> pd.DataFrame:
        return simhash_batch(df)

    sigs = docs_ds.map_batches(sig, batch_format="pandas")

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        outs = []
        for c in range(4):
            chunk = (h >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            outs.append(
                pa.table(
                    {
                        "chunk_id": pa.array(np.full(len(h), c, dtype=np.int32), pa.int32()),
                        "chunk": pa.array(chunk, pa.uint64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "simhash": pa.array(h, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    exploded = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates("doc_id")
        ids = d["doc_id"].to_numpy()
        hs = d["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        x = hs[ii] ^ hs[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        a, b = ids[ii][keep], ids[jj][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "hamming": ham[keep]})

    pairs = exploded.groupby(["chunk_id", "chunk"]).map_groups(bucket_pairs, batch_format="pandas")

    def key_stage(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        k = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        return batch.append_column("pk", pa.array(k, pa.uint64()))

    keyed = pairs.map_batches(key_stage, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("pk").map_groups(lambda df: df.head(1), batch_format="pandas").drop_columns(["pk"])


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_pairs(emb_ds, emb_table: pa.Table, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold over an embedding column.

    Ray side: per-batch matmul against the broadcast (normalized)
    matrix — the brute-force baseline; the scale path buckets by an
    LSH of the embedding first (see functions/ann.py). Oracle:
    DuckDB list_cosine_similarity self-join.
    """
    import ray

    ids = emb_table.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = emb_table.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(ids), -1
    )
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        b_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bc = batch.column("embedding")
        if isinstance(bc, pa.ChunkedArray):
            bc = bc.combine_chunks()
        bm = np.asarray(bc.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            len(b_ids), -1
        )
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        bm = bm / bn[:, None]
        sims = bm @ m.T
        out_a, out_b = [], []
        for i in range(len(b_ids)):
            hits = np.flatnonzero((sims[i] >= threshold) & (all_ids > b_ids[i]))
            out_a += [int(b_ids[i])] * len(hits)
            out_b += [int(x) for x in all_ids[hits]]
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
