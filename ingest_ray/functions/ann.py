"""Approximate / exact nearest-neighbor search over an embedding
column (``list<float>``).

* ``brute_force_topk`` — the baseline: per-batch float64 matmul of the
  corpus against a broadcast query matrix (``ray.put`` once, read per
  task). Exact; SQL-oracle-checkable (DuckDB list_cosine_similarity).
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets both
  sides, candidates only from matching buckets (± multi-probe), then
  exact re-rank. Same output contract; recall < 1 by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _emb_matrix(table: pa.Table, id_col: str = "vec_id", emb_col: str = "embedding"):
    ids = table.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    col = table.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(ids), -1
    )
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def _list_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, dim) float64 matrix via Arrow list
    offsets — no per-row Python conversion (the round-2 hot spot in
    ``ivf_topk.per_list``). Fixed-dimension embeddings are the
    contract: ragged or null rows raise instead of silently reading
    neighboring rows' values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    dim = int(off[1] - off[0])
    if col.null_count or not np.all(np.diff(off) == dim):
        raise ValueError(
            "embedding column is ragged or has nulls; fixed-dimension "
            f"list<float> is the contract (first row dim={dim})"
        )
    return np.asarray(
        vals[off[0] : off[0] + n * dim], dtype=np.float64
    ).reshape(n, dim)


def brute_force_topk(corpus_ds, queries_table: pa.Table, k: int = 5):
    """corpus Dataset ⋈ query matrix → (qid, vec_id, rank) top-k by
    cosine (ties → lower vec_id), exact.

    Two stages: per-batch local top-k against the broadcast query
    matrix (the only full pass over the corpus), then a tiny global
    merge per query. Output is rank-only (no float column) so the
    DuckDB oracle hash-matches exactly.
    """
    q_ids, q_mat = _emb_matrix(queries_table)
    qn = _normalize(q_mat)
    ref = ray.put((q_ids, qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        matn = _normalize(mat)
        sims = qmat @ matn.T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(qids)):
            # partial top-k with deterministic (−cos, vec_id) order
            order = np.lexsort((ids, -sims[qi]))[:kk]
            out_q += [int(qids[qi])] * len(order)
            out_v += [int(x) for x in ids[order]]
            out_c += [float(x) for x in sims[qi][order]]
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = corpus_ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df[["qid", "vec_id", "rank"]]

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


def _kmeans_cosine(mat: np.ndarray, nlist: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (cosine) for IVF coarse
    quantization — seeded init, fixed iteration count."""
    rng = np.random.default_rng(seed)
    matn = _normalize(mat)
    nlist = min(nlist, len(matn))
    cent = matn[rng.choice(len(matn), size=nlist, replace=False)].copy()
    for _ in range(iters):
        centn = _normalize(cent)
        assign = np.argmax(matn @ centn.T, axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                cent[c] = matn[m].mean(axis=0)
    return _normalize(cent)


def ivf_topk(
    queries_ds,
    corpus_ds,
    k: int = 5,
    nlist: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    train_sample: int = 4096,
):
    """IVF ANN with a DATASET corpus — the scale path: the corpus is
    never collected or broadcast. Coarse centroids are trained on a
    small driver-side sample (the only collected data, size-bounded),
    then ONE shuffle keyed by inverted-list id co-locates each query
    (replicated to its ``nprobe`` nearest lists) with that list's
    corpus vectors; per-list exact cosine re-rank, then a tiny
    per-query merge. Approximate — recall vs :func:`brute_force_topk`
    is pinned by tests.
    """
    import pyarrow.parquet  # noqa: F401

    sample_rows = corpus_ds.limit(train_sample).take_all()
    s_tbl = pa.Table.from_pylist(sample_rows)
    _, s_mat = _emb_matrix(s_tbl)
    cent = _kmeans_cosine(s_mat, nlist, seed=seed)
    cent_ref = ray.put(cent)
    EMB = pa.list_(pa.float32())

    def corpus_side(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _emb_matrix(batch)
        matn = _normalize(mat)
        lid = np.argmax(matn @ c.T, axis=1).astype(np.int32)
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "lid": pa.array(lid, pa.int32()),
                "is_q": pa.array(np.zeros(len(ids), dtype=bool), pa.bool_()),
                "id": pa.array(ids, pa.int64()),
                "emb": col.cast(EMB),
            }
        )

    def query_side(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qids, qmat = _emb_matrix(batch)
        qn = _normalize(qmat)
        sims = qn @ c.T
        npb = min(nprobe, sims.shape[1])
        probes = np.argpartition(-sims, npb - 1, axis=1)[:, :npb].astype(np.int32)
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rep = pa.array(np.repeat(np.arange(len(qids)), npb), pa.int64())
        return pa.table(
            {
                "lid": pa.array(probes.reshape(-1), pa.int32()),
                "is_q": pa.array(np.ones(len(qids) * npb, dtype=bool), pa.bool_()),
                "id": pa.array(np.repeat(qids, npb), pa.int64()),
                "emb": col.cast(EMB).take(rep),
            }
        )

    unioned = corpus_ds.map_batches(corpus_side, batch_format="pyarrow", zero_copy_batch=True).union(
        queries_ds.map_batches(query_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    PART_SCHEMA = pa.schema(
        [
            pa.field("qid", pa.int64()),
            pa.field("vec_id", pa.int64()),
            pa.field("cos", pa.float64()),
        ]
    )

    def per_list(t: pa.Table) -> pa.Table:
        is_q = t.column("is_q").to_numpy(zero_copy_only=False).astype(bool)
        if not is_q.any() or is_q.all():
            return PART_SCHEMA.empty_table()
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_list_matrix(t.column("emb")))
        c_ids, c_mat = ids[~is_q], mat[~is_q]
        q_ids, q_mat = ids[is_q], mat[is_q]
        sims = q_mat @ c_mat.T
        kk = min(k, sims.shape[1])
        out_q, out_v, out_c = [], [], []
        for i in range(len(q_ids)):
            order = np.lexsort((c_ids, -sims[i]))[:kk]
            out_q += [int(q_ids[i])] * len(order)
            out_v += [int(x) for x in c_ids[order]]
            out_c += [float(x) for x in sims[i][order]]
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = unioned.groupby("lid").map_groups(per_list, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["qid", "vec_id"])
        df = df.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df[["qid", "vec_id", "rank"]]

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


class _LshIndexActor:
    """Actor-pool stage: hyperplane-LSH bucketed candidate search.

    __init__ builds bucket tables once per actor from the broadcast
    corpus; __call__ answers query batches (multi-probe: exact bucket
    plus all 1-bit-flip neighbors).
    """

    def __init__(self, corpus_ref, planes_ref, k: int):
        ids, mat = ray.get(corpus_ref)
        self.planes = ray.get(planes_ref)
        self.k = k
        self.ids = ids
        self.matn = _normalize(mat)
        codes = (self.matn @ self.planes.T > 0).astype(np.uint64)
        self.codes = (codes << np.arange(self.planes.shape[0], dtype=np.uint64)[None, :]).sum(
            axis=1
        )
        order = np.argsort(self.codes, kind="stable")
        self.codes_sorted = self.codes[order]
        self.order = order

    def _bucket(self, code: int) -> np.ndarray:
        lo = np.searchsorted(self.codes_sorted, code, side="left")
        hi = np.searchsorted(self.codes_sorted, code, side="right")
        return self.order[lo:hi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qmat = _emb_matrix(batch)
        qn = _normalize(qmat)
        nbits = self.planes.shape[0]
        out_q, out_v, out_r = [], [], []
        qcodes = (qn @ self.planes.T > 0).astype(np.uint64)
        qcodes = (qcodes << np.arange(nbits, dtype=np.uint64)[None, :]).sum(axis=1)
        for i in range(len(qids)):
            code = int(qcodes[i])
            cand = [self._bucket(code)]
            for b in range(nbits):  # multi-probe: 1-bit flips
                cand.append(self._bucket(code ^ (1 << b)))
            cand = np.unique(np.concatenate(cand)) if cand else np.empty(0, np.int64)
            if len(cand) == 0:
                continue
            sims = self.matn[cand] @ qn[i]
            order = np.lexsort((self.ids[cand], -sims))[: self.k]
            sel = cand[order]
            out_q += [int(qids[i])] * len(sel)
            out_v += [int(x) for x in self.ids[sel]]
            out_r += list(range(len(sel)))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )


def lsh_topk(
    queries_ds,
    corpus_table: pa.Table,
    k: int = 5,
    nbits: int = 8,
    seed: int = 42,
    concurrency: int = 2,
):
    """LSH-bucketed ANN: deterministic hyperplanes (seeded), actor-pool
    index, multi-probe (1-bit flips). Approximate — compare recall
    against brute_force_topk in tests."""
    ids, mat = _emb_matrix(corpus_table)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    corpus_ref = ray.put((ids, mat))
    planes_ref = ray.put(planes)
    return queries_ds.map_batches(
        _LshIndexActor,
        fn_constructor_kwargs={"corpus_ref": corpus_ref, "planes_ref": planes_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
