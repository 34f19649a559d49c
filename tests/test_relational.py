"""Semi/anti join, stratified sampling, and term-stats operators:
distributed plans must equal their broadcast twins, and sampling must
be a pure function of the key."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n_left=500, n_right=300, seed=7):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 400, n_left), pa.int64()),
            "payload": pa.array(rng.integers(0, 10**6, n_left), pa.int64()),
        }
    )
    right = pa.table({"rk": pa.array(rng.integers(200, 600, n_right), pa.int64())})
    return left, right


def _sorted_rows(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("which", ["semi", "anti"])
def test_exists_join_distributed_equals_broadcast(ray_session, which):
    import ray.data as rd

    from ingest_ray.functions.relational import anti_join, semi_join

    fn = semi_join if which == "semi" else anti_join
    left_t, right_t = _mk()
    a = fn(
        rd.from_arrow(left_t), rd.from_arrow(right_t), left_key="k", right_key="rk"
    )
    b = fn(
        rd.from_arrow(left_t),
        rd.from_arrow(right_t),
        left_key="k",
        right_key="rk",
        broadcast_limit=0,  # force the tagged-union distributed plan
    )
    da, db = _sorted_rows(a), _sorted_rows(b)
    pd.testing.assert_frame_equal(da, db)
    # ground truth
    in_set = np.isin(
        left_t.column("k").to_numpy(), np.unique(right_t.column("rk").to_numpy())
    )
    want = int(in_set.sum()) if which == "semi" else int((~in_set).sum())
    assert len(da) == want


def test_exists_join_empty_right(ray_session):
    import ray.data as rd

    from ingest_ray.functions.relational import anti_join, semi_join

    left_t, _ = _mk()
    empty = pa.table({"rk": pa.array([], pa.int64())})
    assert semi_join(
        rd.from_arrow(left_t), rd.from_arrow(empty), left_key="k", right_key="rk"
    ).count() == 0
    assert anti_join(
        rd.from_arrow(left_t), rd.from_arrow(empty), left_key="k", right_key="rk"
    ).count() == len(left_t)


def test_stratified_sample_deterministic_and_rated(ray_session):
    import ray.data as rd

    from ingest_ray.functions.sampling import stratified_sample

    n = 20_000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "s": pa.array(np.where(np.arange(n) % 3 == 0, "a", "b")),
        }
    )
    kw = dict(key="id", strata_col="s", rates={"a": 0.25}, default_rate=0.75)
    one = stratified_sample(rd.from_arrow(t), **kw).to_pandas()
    two = stratified_sample(rd.from_arrow(t), **kw).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values("id").reset_index(drop=True),
        two.sort_values("id").reset_index(drop=True),
    )
    ra = (one["s"] == "a").sum() / (n // 3 + 1)
    rb = (one["s"] == "b").sum() / (n - n // 3 - 1)
    assert abs(ra - 0.25) < 0.03 and abs(rb - 0.75) < 0.03
    # rate edges: 0 drops everything, 1 keeps everything
    assert (
        stratified_sample(
            rd.from_arrow(t), key="id", strata_col="s", rates={}, default_rate=0.0
        ).count()
        == 0
    )
    assert (
        stratified_sample(
            rd.from_arrow(t), key="id", strata_col="s", rates={}, default_rate=1.0
        ).count()
        == n
    )
    # different salt selects a different (deterministic) subset
    salted = stratified_sample(rd.from_arrow(t), salt=99, **kw).to_pandas()
    assert set(salted["id"]) != set(one["id"])


def test_per_stratum_sample_exact_n_and_deterministic(ray_session):
    import ray.data as rd

    from ingest_ray.functions.sampling import per_stratum_sample

    n = 5_000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "s": pa.array([("x", "y", "z")[i % 3] for i in range(n)]),
        }
    )
    one = per_stratum_sample(rd.from_arrow(t), strata_col="s", key="id", n=40).to_pandas()
    two = per_stratum_sample(rd.from_arrow(t), strata_col="s", key="id", n=40).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values(["s", "id"]).reset_index(drop=True),
        two.sort_values(["s", "id"]).reset_index(drop=True),
    )
    assert one.groupby("s").size().tolist() == [40, 40, 40]
    # a stratum smaller than n yields all its rows
    small = pa.table(
        {"id": pa.array([1, 2, 3], pa.int64()), "s": pa.array(["only"] * 3)}
    )
    got = per_stratum_sample(rd.from_arrow(small), strata_col="s", key="id", n=40)
    assert got.count() == 3


def test_pack_sequences_prefix_invariant(ray_session):
    import ray.data as rd

    from ingest_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(11)
    # skewed, non-contiguous ids across many range buckets
    ids = np.unique(rng.integers(0, 10**7, 3000))
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 40, len(ids))]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    out = (
        pack_sequences(rd.from_arrow(t), seq_len=128, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = out["n_tokens"].to_numpy()
    start = out["start_tok"].to_numpy()
    # exact exclusive prefix sum in doc_id order — across bucket seams
    assert (start == np.cumsum(n) - n).all()
    assert (out["seq_id"].to_numpy() == start // 128).all()
    assert (out["offset_in_seq"].to_numpy() == start % 128).all()


def test_exact_quantiles_refinement(ray_session):
    import ray.data as rd

    from ingest_ray.functions.quantiles import exact_quantiles

    rng = np.random.default_rng(5)
    # lognormal + a heavy duplicated spike (one value = 30% of mass)
    v = np.concatenate(
        [rng.lognormal(3.0, 1.5, 70_000), np.full(30_000, 7.25)]
    )
    t = pa.table({"x": pa.array(v, pa.float64())})
    qs = (0.1, 0.5, 0.9, 0.99)
    got = exact_quantiles(
        rd.from_arrow(t), col="x", qs=qs, num_buckets=16, collect_limit=500
    )
    s = np.sort(v)
    import math

    for q in qs:
        want = s[min(max(math.ceil(q * len(v)) - 1, 0), len(v) - 1)]
        assert got[q] == want, (q, got[q], want)


def test_pack_sequences_empty_corpus(ray_session):
    import ray.data as rd

    from ingest_ray.functions.packing import OUT_SCHEMA, pack_sequences

    empty = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    out = pack_sequences(rd.from_arrow(empty))
    assert out.count() == 0 and out.schema().names == OUT_SCHEMA.names


def test_group_topk_indices_kernel():
    from ingest_ray.functions.ranking import group_topk_indices

    group = np.array(["b", "a", "a", "b", "a"])
    hv = np.array([5, 9, 7, 1, 8], dtype=np.uint64)
    tie = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    sel, rank0 = group_topk_indices(group, [(hv, False), (tie, False)], 2)
    # group a: hv 9 (idx1), 8 (idx4); group b: 5 (idx0), 1 (idx3)
    got = {(g, int(h), int(r)) for g, h, r in zip(group[sel], hv[sel], rank0)}
    assert got == {("a", 9, 0), ("a", 8, 1), ("b", 5, 0), ("b", 1, 1)}
    # string ascending order inside groups
    words = np.array(["m", "z", "a", "z", "a"])
    sel2, r2 = group_topk_indices(
        np.array([1, 1, 1, 2, 2], dtype=np.int64), [(words, True)], 1
    )
    assert list(words[sel2]) == ["a", "a"] and list(r2) == [0, 0]


def test_pack_sequences_extreme_id_span(ray_session):
    import ray.data as rd

    from ingest_ray.functions.packing import pack_sequences

    # id span near int64 max — the int64 bucket multiply would wrap
    ids = np.array([0, 3, 2**62, 2**63 - 10], dtype=np.int64)
    texts = ["a b c", "d", "e f", "g h i j"]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    out = (
        pack_sequences(rd.from_arrow(t), seq_len=4, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = out["n_tokens"].to_numpy()
    assert (out["start_tok"].to_numpy() == np.cumsum(n) - n).all()


def test_group_topk_indices_matches_pandas_reference():
    from ingest_ray.functions.ranking import group_topk_indices

    rng = np.random.default_rng(17)
    for trial in range(25):
        n = int(rng.integers(1, 400))
        k = int(rng.integers(1, 5))
        g = rng.choice([f"g{i}" for i in range(6)], n)
        a = rng.integers(0, 8, n).astype(np.uint64)  # heavy ties
        b = rng.choice(list("xyzw"), n)
        df = pd.DataFrame({"g": g, "a": a, "b": b, "i": np.arange(n)})
        sel, rank0 = group_topk_indices(g, [(a, False), (b, True)], k)
        got = (
            pd.DataFrame({"g": g[sel], "a": a[sel], "b": b[sel], "rank": rank0})
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        want = (
            df.sort_values(["g", "a", "b"], ascending=[True, False, True])
            .groupby("g", sort=True)
            .head(k)
            .assign(rank=lambda d: d.groupby("g", sort=False).cumcount())
            .drop(columns="i")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["g", "a", "b", "rank"]], want[["g", "a", "b", "rank"]]
        )


def test_top_terms_distributed_equals_broadcast(ray_session):
    import ray.data as rd

    from ingest_ray.functions.terms import top_terms

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(400)
    ] + ["", "   "]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = top_terms(rd.from_arrow(t), k=3)
    b = top_terms(rd.from_arrow(t), k=3, broadcast_vocab_limit=0)
    da, db = _sorted_rows(a), _sorted_rows(b)
    pd.testing.assert_frame_equal(da, db)
    # every non-blank doc has <= 3 rows, ranks 1..m
    g = da.groupby("doc_id")["rank"].agg(["count", "min", "max"])
    assert (g["count"] <= 3).all() and (g["min"] == 1).all()
    assert (g["max"] == g["count"]).all()


@pytest.mark.parametrize("which", ["semi", "anti"])
def test_bloom_exists_join_equals_exact(ray_session, which):
    """Bloom pre-filtered joins are EXACT (false positives verified
    away, false negatives impossible) — equal to the plain operators
    even with a deliberately tiny, collision-heavy filter."""
    import ray.data as rd

    from ingest_ray.functions.relational import (
        anti_join,
        anti_join_bloom,
        semi_join,
        semi_join_bloom,
    )

    exact = semi_join if which == "semi" else anti_join
    bloom = semi_join_bloom if which == "semi" else anti_join_bloom
    left_t, right_t = _mk(n_left=2000, n_right=500, seed=23)
    a = exact(rd.from_arrow(left_t), rd.from_arrow(right_t), left_key="k", right_key="rk")
    # 256-bit filter over 400 distinct keys → nearly every probe is a
    # false positive; the verify stage must still produce exact output
    b = bloom(
        rd.from_arrow(left_t),
        rd.from_arrow(right_t),
        left_key="k",
        right_key="rk",
        num_bits=256,
        num_hashes=2,
    )
    pd.testing.assert_frame_equal(_sorted_rows(a), _sorted_rows(b))
    # and with a realistic filter + forced distributed verify plan
    c = bloom(
        rd.from_arrow(left_t),
        rd.from_arrow(right_t),
        left_key="k",
        right_key="rk",
        num_bits=1 << 16,
        num_hashes=4,
        broadcast_limit=0,
    )
    pd.testing.assert_frame_equal(_sorted_rows(a), _sorted_rows(c))


def test_bloom_filter_no_false_negatives(ray_session):
    import ray.data as rd

    from ingest_ray.functions.relational import (
        _bloom_maybe_mask,
        build_bloom,
    )

    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(-(2**62), 2**62, 5000))
    ds = rd.from_arrow(pa.table({"rk": pa.array(keys, pa.int64())})).repartition(7)
    bits = build_bloom(ds, "rk", num_bits=1 << 18, num_hashes=4)
    assert _bloom_maybe_mask(keys, bits, 1 << 18, 4).all()


def test_global_shuffle_order_is_dense_deterministic_permutation(ray_session):
    import ray.data as rd

    from ingest_ray.functions.packing import global_shuffle_order
    from ingest_ray.util import splitmix64

    rng = np.random.default_rng(31)
    ids = np.unique(rng.integers(0, 10**9, 3000)).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    a = global_shuffle_order(rd.from_arrow(t).repartition(7)).to_pandas()
    b = global_shuffle_order(rd.from_arrow(t).repartition(2), num_buckets=13).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partitioning/bucketing-invariant
    # dense permutation 0..N-1
    assert sorted(a["pos"].tolist()) == list(range(len(ids)))
    # matches the brute-force order by (h, id)
    h = splitmix64(ids.astype(np.uint64))
    want = np.empty(len(ids), dtype=np.int64)
    want[np.lexsort((ids, h))] = np.arange(len(ids))
    got = a.set_index("doc_id")["pos"]
    assert np.array_equal(got.loc[ids].to_numpy(), want)
    # a different salt is a different permutation
    c = global_shuffle_order(rd.from_arrow(t), salt=99).to_pandas()
    c = c.sort_values("doc_id").reset_index(drop=True)
    assert not np.array_equal(c["pos"].to_numpy(), a["pos"].to_numpy())


def test_weighted_sample_deterministic_and_proportional(ray_session):
    import ray.data as rd

    from ingest_ray.functions.sampling import weighted_sample
    from ingest_ray.util import splitmix64

    rng = np.random.default_rng(41)
    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 100, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "w": pa.array(w, pa.int64())})
    rate = 1 / 128.0
    a = weighted_sample(
        rd.from_arrow(t).repartition(8), key="doc_id", weight_col="w", rate=rate
    ).to_pandas()
    b = weighted_sample(
        rd.from_arrow(t).repartition(3), key="doc_id", weight_col="w", rate=rate
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-invariant
    # exact membership: u < rate*w
    u = splitmix64(ids.astype(np.uint64)).astype(np.float64) / 2.0**64
    want = ids[u < rate * w]
    assert sorted(a["doc_id"].tolist()) == want.tolist()
    # selection probability scales with weight: top-weight decile kept
    # far more often than bottom decile
    hi = (w >= 90).mean() and a["w"].ge(90).sum() / (w >= 90).sum()
    lo = a["w"].le(10).sum() / max((w <= 10).sum(), 1)
    assert hi > 3 * lo


def test_lag_delta_matches_pandas(ray_session):
    import ray.data as rd

    from ingest_ray.functions.temporal import lag_delta

    rng = np.random.default_rng(51)
    n = 5000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 10**9, n).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array(rng.integers(0, 80, n), pa.int64()),
        }
    )
    got = (
        lag_delta(rd.from_arrow(t).repartition(7), key="user_id", ts="ts", tiebreak="event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["lag_us"] = df.groupby("user_id")["ts"].diff() / np.timedelta64(1, "us")
    want = df.sort_values("event_id").reset_index(drop=True)
    ga = got["lag_us"].to_numpy(dtype="float64", na_value=np.nan)
    wa = want["lag_us"].to_numpy(dtype="float64", na_value=np.nan)
    assert np.array_equal(np.isnan(ga), np.isnan(wa))
    assert np.array_equal(ga[~np.isnan(ga)], wa[~np.isnan(wa)])


def test_grouped_quantiles_matches_reference(ray_session):
    import ray.data as rd

    from ingest_ray.functions.grouped import grouped_quantiles

    rng = np.random.default_rng(52)
    n = 20_000
    keys = rng.integers(0, 300, n)  # many groups, some tiny
    vals = rng.normal(size=n)
    t = pa.table(
        {"g": pa.array(keys, pa.int64()), "value": pa.array(vals, pa.float64())}
    )
    got = (
        grouped_quantiles(rd.from_arrow(t).repartition(8), key="g", value="value", qs=(0.5,))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for r in got.itertuples():
        v = np.sort(vals[keys == r.g])
        rank = max(int(np.ceil(0.5 * len(v))) - 1, 0)
        assert r.q50 == v[rank]
    assert len(got) == len(np.unique(keys))


def test_filter_by_group_quantile_matches_reference(ray_session):
    import ray.data as rd

    from ingest_ray.functions.grouped import filter_by_group_quantile

    rng = np.random.default_rng(53)
    n = 5_000
    langs = np.array(["en", "de", "fr", "zz"])[rng.integers(0, 4, n)]
    vals = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    got = (
        filter_by_group_quantile(
            rd.from_arrow(t).repartition(6), key="lang", value="v", q=0.5
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    keep = np.zeros(n, dtype=bool)
    for lang in np.unique(langs):
        sel = langs == lang
        v = np.sort(vals[sel])
        med = v[max(int(np.ceil(0.5 * len(v))) - 1, 0)]
        keep[sel] = vals[sel] >= med
    assert got["id"].tolist() == np.flatnonzero(keep).tolist()


def test_filter_by_group_quantile_empty_input(ray_session):
    import ray.data as rd

    from ingest_ray.functions.grouped import filter_by_group_quantile

    t = pa.table(
        {"id": pa.array([], pa.int64()), "lang": pa.array([], pa.string()),
         "v": pa.array([], pa.int64())}
    )
    out = filter_by_group_quantile(rd.from_arrow(t), key="lang", value="v")
    assert out.count() == 0
