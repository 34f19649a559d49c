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
