"""Greedy k-center (farthest-point) selection over an embedding column
— diversity / coreset sampling for training data: pick k points such
that every point is close to some pick (2-approximation of the optimal
k-center cover, the standard greedy from Gonzalez 1985).

Ray-Data shape: the chosen centers live in a driver-side (k, dim)
matrix (broadcast via ``ray.put`` each round); every round is ONE
streaming pass where each batch reports only its single farthest row
(argmax of min-distance-to-centers) — one row per block crosses the
wire, the corpus never shuffles and never materializes.

Determinism contract (pytest pins equality with a numpy reference):
the first center is the smallest id, each round picks the global
maximum min-distance with ties broken toward the smaller id, and all
distance math is float64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .ann import _list_matrix

PICKS_SCHEMA = pa.schema(
    [
        pa.field("rank", pa.int64()),
        pa.field("vec_id", pa.int64()),
        pa.field("dist", pa.float64()),
    ]
)


def _min_dist2(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d2 = (
        np.einsum("ij,ij->i", mat, mat)[:, None]
        - 2.0 * (mat @ cents.T)
        + np.einsum("ij,ij->i", cents, cents)[None, :]
    )
    return np.maximum(d2.min(axis=1), 0.0)


def kcenter_select(
    ds,
    k: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """→ Dataset (rank, vec_id, dist): the k greedy picks in selection
    order; ``dist`` is the point's distance to the nearest PRIOR pick
    (0 for the seed). ``rank`` is 1-based."""
    from ..util import maybe_cache_projection

    # k sequential rounds each stream the corpus: cache the pruned
    # projection in plasma when it provably fits (threshold-guarded;
    # the streaming re-read stays the 10^12-row path)
    ds = maybe_cache_projection(ds, (id_col, emb_col))

    # seed: the smallest id (per-batch min combiner, k rows never shuffle)
    def batch_min(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return batch.select([id_col, emb_col]).slice(0, 0)
        i = int(np.argmin(ids))
        return batch.select([id_col, emb_col]).slice(i, 1)

    parts = list(
        ds.map_batches(
            batch_min, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not parts or sum(len(p) for p in parts) == 0:
        return _from_arrow(PICKS_SCHEMA.empty_table())
    cand = pa.concat_tables(parts)
    ids = cand.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    seed_i = int(np.argmin(ids))
    seed_id = int(ids[seed_i])
    cents = _list_matrix(cand.column(emb_col))[seed_i : seed_i + 1]

    picks = [(1, seed_id, 0.0)]
    for r in range(2, k + 1):
        cref = ray.put(cents)

        def farthest(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(bids) == 0:
                return pa.schema(
                    [
                        pa.field("vec_id", pa.int64()),
                        pa.field("d2", pa.float64()),
                        pa.field(emb_col, batch.schema.field(emb_col).type),
                    ]
                ).empty_table()
            mat = _list_matrix(batch.column(emb_col))
            d2 = _min_dist2(mat, c)
            # ties toward the smaller id within the batch
            pos = np.flatnonzero(d2 == d2.max())
            i = int(pos[np.argmin(bids[pos])])
            return pa.table(
                {
                    "vec_id": pa.array(bids[i : i + 1], pa.int64()),
                    "d2": pa.array(d2[i : i + 1], pa.float64()),
                    emb_col: batch.column(emb_col).slice(i, 1),
                }
            )

        tops = pa.concat_tables(
            list(
                ds.map_batches(
                    farthest, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_size=None, batch_format="pyarrow")
            )
        )
        if len(tops) == 0:
            break
        tid = tops.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        td2 = tops.column("d2").to_numpy(zero_copy_only=False)
        best = td2.max()
        if best <= 0.0:  # every remaining point coincides with a center
            break
        sel = np.flatnonzero(td2 == best)
        w = int(sel[np.argmin(tid[sel])])
        picks.append((r, int(tid[w]), float(np.sqrt(best))))
        cents = np.vstack([cents, _list_matrix(tops.column(emb_col))[w : w + 1]])

    out = pa.table(
        {
            "rank": pa.array([p[0] for p in picks], pa.int64()),
            "vec_id": pa.array([p[1] for p in picks], pa.int64()),
            "dist": pa.array([p[2] for p in picks], pa.float64()),
        }
    ).cast(PICKS_SCHEMA)
    return _from_arrow(out)


def _from_arrow(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)
