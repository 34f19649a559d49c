"""k-means: Ray implementation must be bit-equal to a local numpy
Lloyd reference with the same deterministic init."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_kmeans(ids, mat, k, n_iters):
    order = np.argsort(ids)
    cents = mat[order[:k]].astype(np.float64)
    for _ in range(n_iters):
        d2 = (
            np.einsum("ij,ij->i", mat, mat)[:, None]
            - 2.0 * mat @ cents.T
            + np.einsum("ij,ij->i", cents, cents)[None, :]
        )
        idx = np.argmin(d2, axis=1)
        nxt = cents.copy()
        for c in range(k):
            sel = idx == c
            if sel.any():
                nxt[c] = mat[sel].mean(axis=0)
        cents = nxt
    d2 = (
        np.einsum("ij,ij->i", mat, mat)[:, None]
        - 2.0 * mat @ cents.T
        + np.einsum("ij,ij->i", cents, cents)[None, :]
    )
    return cents, np.argmin(d2, axis=1)


def _mk_ds(ids, mat, nparts=4):
    import ray.data as rd

    emb = pa.array([row.tolist() for row in mat], pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})
    return rd.from_arrow(t).repartition(nparts)


def test_kmeans_matches_numpy_reference(ray_session):
    from ingest_ray.functions.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(11)
    n, d, k = 400, 8, 5
    mat = np.asarray(
        rng.normal(size=(n, d)).astype(np.float32), dtype=np.float64
    )
    ids = rng.permutation(n).astype(np.int64)
    ds = _mk_ds(ids, mat)

    cents = kmeans_fit(ds, k=k, n_iters=6)
    ref_cents, ref_idx = _ref_kmeans(ids, mat, k, 6)
    np.testing.assert_allclose(cents, ref_cents, rtol=0, atol=1e-12)

    got = kmeans_assign(ds, cents).to_pandas().set_index("vec_id")
    want = dict(zip(ids.tolist(), ref_idx.tolist()))
    assert {int(i): int(c) for i, c in got["cluster"].items()} == want
    # dist2 non-negative and finite
    assert (got["dist2"] >= 0).all() and np.isfinite(got["dist2"]).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from ingest_ray.functions.kmeans import kmeans_fit

    # two tight blobs, k=3: one centroid (seeded on a blob member that
    # immediately loses all points) must keep its previous position
    # rather than going NaN
    pts = np.vstack(
        [
            np.full((5, 2), 0.0) + np.arange(5)[:, None] * 1e-3,
            np.full((5, 2), 10.0) + np.arange(5)[:, None] * 1e-3,
        ]
    )
    ids = np.arange(10, dtype=np.int64)
    ds = _mk_ds(ids, pts, nparts=2)
    cents = kmeans_fit(ds, k=3, n_iters=4)
    assert np.isfinite(cents).all()


def test_kmeans_k_exceeds_corpus_raises(ray_session):
    from ingest_ray.functions.kmeans import kmeans_fit

    ds = _mk_ds(np.arange(3, dtype=np.int64), np.eye(3), nparts=1)
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_fit(ds, k=5, n_iters=1)
