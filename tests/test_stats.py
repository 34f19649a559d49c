"""Cardinality stats (exact distinct + HLL) and document chunking."""

import numpy as np
import pyarrow as pa


def test_distinct_count_exact(ray_session):
    import ray.data as rd

    from ingest_ray.functions.stats import distinct_count

    rng = np.random.default_rng(9)
    keys = rng.integers(-(2**40), 2**40, 20_000)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(8)
    assert distinct_count(ds, "k") == len(np.unique(keys))


def test_distinct_count_empty(ray_session):
    import ray.data as rd

    from ingest_ray.functions.stats import distinct_count

    ds = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert distinct_count(ds, "k") == 0


def test_hll_count_within_error(ray_session):
    import ray.data as rd

    from ingest_ray.functions.stats import hll_count

    rng = np.random.default_rng(21)
    # heavy duplication: 200k rows over ~50k distincts
    keys = rng.integers(0, 50_000, 200_000)
    exact = len(np.unique(keys))
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(16)
    est = hll_count(ds, "k", p=14)
    assert abs(est / exact - 1.0) < 0.05, (est, exact)


def test_hll_register_merge_is_order_free():
    from ingest_ray.functions.stats import _hll_estimate, _hll_partial

    rng = np.random.default_rng(4)
    a = rng.integers(0, 10_000, 30_000)
    b = rng.integers(5_000, 15_000, 30_000)
    both = _hll_partial(np.concatenate([a, b]), 12)
    merged = np.maximum(_hll_partial(a, 12), _hll_partial(b, 12))
    assert np.array_equal(both, merged)
    exact = len(np.unique(np.concatenate([a, b])))
    assert abs(_hll_estimate(merged, 12) / exact - 1.0) < 0.1


def test_chunk_documents_invariants(ray_session):
    import ray.data as rd

    from ingest_ray.functions.chunking import chunk_documents

    rng = np.random.default_rng(2)
    texts = [" ".join(f"t{j}" for j in range(int(rng.integers(0, 150)))) for _ in range(300)]
    t = pa.table(
        {"doc_id": pa.array(np.arange(300), pa.int64()), "text": pa.array(texts)}
    )
    W, V = 20, 5
    rows = chunk_documents(rd.from_arrow(t).repartition(5), window=W, overlap=V).take_all()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    stride = W - V
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        toks = texts[d].split(" ")
        # chunk indexes are dense from 0; every token covered; overlap exact
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            s = c["chunk_idx"] * stride
            e = min(s + W, len(toks))
            assert c["chunk_text"] == " ".join(toks[s:e])
            assert c["n_tok"] == e - s
        last = chunks[-1]
        assert last["chunk_idx"] * stride + last["n_tok"] == len(toks)
    assert len(by_doc) == 300  # every doc chunked (empty text → 1 chunk of [''])


def test_chunk_documents_overlap_bounds():
    import pytest

    from ingest_ray.functions.chunking import chunk_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b"])})
    with pytest.raises(ValueError):
        chunk_batch(t, window=8, overlap=8)


def test_exact_heavy_hitters(ray_session):
    import ray.data as rd

    from ingest_ray.functions.stats import exact_heavy_hitters

    rng = np.random.default_rng(8)
    vals = rng.zipf(1.5, 40_000) % 1000
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    got = exact_heavy_hitters(ds, "v", min_count=100).to_pandas()
    u, c = np.unique(vals, return_counts=True)
    want = {int(a): int(b) for a, b in zip(u[c >= 100], c[c >= 100])}
    assert {int(r.v): int(r.n) for r in got.itertuples()} == want


def test_misra_gries_sketch_bounds(ray_session):
    import ray.data as rd

    from ingest_ray.functions.stats import heavy_hitters

    rng = np.random.default_rng(12)
    vals = rng.zipf(1.3, 120_000) % 50_000  # long tail, many distincts
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(12)
    k = 256
    sk = heavy_hitters(ds, "v", k=k).to_pandas()
    u, c = np.unique(vals, return_counts=True)
    true = dict(zip(u.tolist(), c.tolist()))
    err = int(sk["n_hi"].iloc[0] - sk["n_lo"].iloc[0])
    assert err <= len(vals) // (k + 1)
    # bounds contain the truth for every surviving counter
    for r in sk.itertuples():
        assert r.n_lo <= true[int(r.v)] <= r.n_hi
    # no false negatives above the decrement: every value with true
    # count > err is present
    survivors = set(sk["v"].tolist())
    for v, n in true.items():
        if n > err:
            assert v in survivors, (v, n, err)


def test_pack_sequences_depth_bucketing_matches_width(ray_session):
    import pandas as pd
    import ray.data as rd

    from ingest_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(3)
    # heavily skewed id space: dense cluster + far outliers (equal-width
    # buckets would put ~everything in one bucket)
    ids = np.unique(
        np.concatenate(
            [rng.integers(0, 2_000, 800), rng.integers(10**12, 10**12 + 10**9, 200)]
        )
    )
    texts = [" ".join("x" * 1 for _ in range(int(rng.integers(1, 30)))) for _ in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    a = (
        pack_sequences(rd.from_arrow(t).repartition(6), seq_len=128, bucketing="width")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_sequences(rd.from_arrow(t).repartition(3), seq_len=128, bucketing="depth")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pivot_counts_matches_pandas(ray_session):
    import ray.data as rd

    from ingest_ray.functions.pivot import pivot_counts

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 200, 20_000)
    cats = np.array(["a", "b", "c", "dd"])[rng.integers(0, 4, 20_000)]
    t = pa.table(
        {"k": pa.array(keys, pa.int64()), "cat": pa.array(cats.tolist(), pa.string())}
    )
    got = (
        pivot_counts(rd.from_arrow(t).repartition(9), row_key="k", cat_col="cat")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.crosstab(pd.Series(keys, name="k"), pd.Series(cats, name="cat"))
        .reindex(columns=["a", "b", "c", "dd"], fill_value=0)
        .reset_index()
    )
    assert got.columns.tolist() == ["k", "n_a", "n_b", "n_c", "n_dd"]
    assert np.array_equal(got["k"].to_numpy(), want["k"].to_numpy())
    for c in ["a", "b", "c", "dd"]:
        assert np.array_equal(got[f"n_{c}"].to_numpy(), want[c].to_numpy())
