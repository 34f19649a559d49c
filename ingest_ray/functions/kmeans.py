"""Distributed k-means (Lloyd's algorithm) over an embedding column
(``list<float>``) — the iterative-ML pattern on Ray Data: centroids
live in the object store (``ray.put`` once per round, read per task),
each round is ONE streaming pass of per-batch partial sums (k×dim
scalars per batch cross the wire, never the points), and the driver
folds the k partial rows. No shuffle at any point; the corpus is
re-streamed per round — O(k·dim) driver state regardless of corpus
size.

Determinism contract (what the tests pin): centroids are initialised
from the k smallest ids (one bounded ``sort.limit(k)``), ties in
assignment break toward the lower centroid index, and every
accumulation is float64 — so a numpy reference implementation with the
same init and iteration count produces bit-equal assignments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .ann import _list_matrix

ASSIGN_SCHEMA = pa.schema(
    [
        pa.field("vec_id", pa.int64()),
        pa.field("cluster", pa.int32()),
        pa.field("dist2", pa.float64()),
    ]
)


def _assign(mat: np.ndarray, cents: np.ndarray):
    """points (n,d) × centroids (k,d) → (cluster idx, squared dist).
    argmin over the expanded ||x-c||² = ||x||² - 2x·c + ||c||²; ties
    break to the lower index (np.argmin contract)."""
    x2 = np.einsum("ij,ij->i", mat, mat)
    c2 = np.einsum("ij,ij->i", cents, cents)
    d2 = x2[:, None] - 2.0 * (mat @ cents.T) + c2[None, :]
    idx = np.argmin(d2, axis=1)
    best = d2[np.arange(len(mat)), idx]
    return idx.astype(np.int32), np.maximum(best, 0.0)


def kmeans_fit(
    ds,
    k: int = 8,
    n_iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """→ (k, dim) float64 centroid matrix after ``n_iters`` Lloyd
    rounds. Empty clusters keep their previous centroid (standard
    Lloyd fallback, deterministic)."""
    from ..util import maybe_cache_projection

    # n_iters rounds each stream the corpus: cache the pruned
    # projection when it provably fits plasma (threshold-guarded)
    ds = maybe_cache_projection(ds, (id_col, emb_col))
    # deterministic init: the k smallest ids. A per-batch k-smallest
    # combiner + driver merge of k rows per block — not ds.sort(),
    # which would all-to-all-shuffle the whole corpus for k rows.
    def k_smallest(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sel = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, emb_col]).take(pa.array(sel, pa.int64()))

    cand = pa.concat_tables(
        list(
            ds.map_batches(
                k_smallest, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
    )
    if len(cand) < k:
        raise ValueError(f"kmeans_fit: k={k} exceeds corpus size {len(cand)}")
    order = np.argsort(cand.column(id_col).to_numpy(zero_copy_only=False))[:k]
    cents = _list_matrix(cand.column(emb_col).take(pa.array(order, pa.int64())))
    dim = cents.shape[1]

    for _ in range(n_iters):
        cref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            mat = _list_matrix(batch.column(emb_col))
            idx, _ = _assign(mat, c)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, idx, mat)
            counts = np.bincount(idx, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int32), pa.int32()),
                    "count": pa.array(counts, pa.int64()),
                    "sum": pa.array(
                        list(sums), pa.list_(pa.float64())
                    ),
                }
            )

        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        # k rows per batch; fold on the driver (k·dim scalars total)
        for part in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            cl = part.column("cluster").to_numpy(zero_copy_only=False)
            cn = part.column("count").to_numpy(zero_copy_only=False)
            sm = _list_matrix(part.column("sum"))
            np.add.at(sums, cl, sm)
            np.add.at(counts, cl, cn)
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents


def kmeans_assign(ds, cents: np.ndarray, id_col: str = "vec_id", emb_col: str = "embedding"):
    """→ Dataset (vec_id, cluster, dist2) for fitted centroids."""
    cref = ray.put(np.asarray(cents, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _list_matrix(batch.column(emb_col))
        idx, d2 = _assign(mat, c)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(idx, pa.int32()),
                "dist2": pa.array(d2, pa.float64()),
            }
        ).cast(ASSIGN_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def kmeans(ds, k: int = 8, n_iters: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """fit + assign in one call → Dataset (vec_id, cluster, dist2)."""
    cents = kmeans_fit(ds, k=k, n_iters=n_iters, id_col=id_col, emb_col=emb_col)
    return kmeans_assign(ds, cents, id_col=id_col, emb_col=emb_col)
