"""Greedy k-center: Ray implementation equals a numpy reference with
the same determinism contract (seed = min id, ties -> smaller id)."""

import numpy as np
import pyarrow as pa


def _ref_kcenter(ids, mat, k):
    order = np.argsort(ids)
    picks = [order[0]]
    dists = [0.0]
    cents = mat[picks]
    while len(picks) < k:
        d2 = (
            np.einsum("ij,ij->i", mat, mat)[:, None]
            - 2.0 * mat @ cents.T
            + np.einsum("ij,ij->i", cents, cents)[None, :]
        )
        dmin = np.maximum(d2.min(axis=1), 0.0)
        best = dmin.max()
        if best <= 0.0:
            break
        pos = np.flatnonzero(dmin == best)
        w = int(pos[np.argmin(ids[pos])])
        picks.append(w)
        dists.append(float(np.sqrt(best)))
        cents = np.vstack([cents, mat[w : w + 1]])
    return [int(ids[p]) for p in picks], dists


def _mk_ds(ids, mat, nparts=4):
    import ray.data as rd

    emb = pa.array([row.tolist() for row in mat], pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})
    return rd.from_arrow(t).repartition(nparts)


def test_kcenter_matches_numpy_reference(ray_session):
    from ingest_ray.functions.kcenter import kcenter_select

    rng = np.random.default_rng(19)
    n, d, k = 300, 6, 10
    mat = np.asarray(rng.normal(size=(n, d)).astype(np.float32), dtype=np.float64)
    ids = rng.permutation(n).astype(np.int64)
    got = kcenter_select(_mk_ds(ids, mat), k=k).to_pandas()
    want_ids, want_d = _ref_kcenter(ids, mat, k)
    assert got["vec_id"].tolist() == want_ids
    assert got["rank"].tolist() == list(range(1, len(want_ids) + 1))
    np.testing.assert_allclose(got["dist"].to_numpy(), want_d, rtol=0, atol=1e-9)


def test_kcenter_duplicates_stop_early(ray_session):
    from ingest_ray.functions.kcenter import kcenter_select

    mat = np.vstack([np.zeros((4, 3)), np.ones((4, 3))])
    ids = np.arange(8, dtype=np.int64)
    got = kcenter_select(_mk_ds(ids, mat, nparts=2), k=5).to_pandas()
    # only two distinct locations exist -> exactly 2 picks
    assert got["vec_id"].tolist() == [0, 4]


def test_kcenter_empty_corpus(ray_session):
    from ingest_ray.functions.kcenter import kcenter_select

    got = kcenter_select(_mk_ds(np.array([], dtype=np.int64), np.zeros((0, 3))), k=3)
    assert got.count() == 0
