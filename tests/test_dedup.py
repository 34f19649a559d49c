"""Dedup family conformance: vectorized kernels vs scalar semantics,
distributed verify vs broadcast verify, cluster assignment invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    did = 0
    for i in range(60):
        base = " ".join(rng.choice(words, size=rng.integers(8, 30)))
        texts.append(base)
        ids.append(did)
        did += 1
        if i % 4 == 0:  # exact duplicates
            for _ in range(int(rng.integers(1, 4))):
                texts.append(base)
                ids.append(did)
                did += 1
        if i % 5 == 0:  # near duplicate (drop last word)
            texts.append(" ".join(base.split()[:-1]))
            ids.append(did)
            did += 1
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


def test_hash64_str_matches_scalar_fnv():
    from ingest_ray.util import U64_MASK, hash64_str

    cases = ["", "a", "hello world", "ü" * 5, "éxyz", "x" * 300]

    def ref(s):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8", "surrogatepass"):
            h = ((h ^ b) * 0x100000001B3) & U64_MASK
        return h

    got = hash64_str(cases)
    assert [int(g) for g in got] == [ref(s) for s in cases]


def test_simhash_vectorized_matches_scalar(corpus):
    from ingest_ray.functions.dedup import simhash_batch
    from ingest_ray.functions.text import _WS
    from ingest_ray.util import hash64_str

    df = corpus.to_pandas()
    got = simhash_batch(df)["simhash"].to_numpy()
    for i, t in enumerate(df["text"].fillna("")):
        ws = _WS.split(t.strip()) if t.strip() else []
        if not ws:
            assert got[i] == 0
            continue
        hs = hash64_str(ws)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        want = int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
        assert int(got[i]) == want


def test_minhash_matrix_matches_scalar(corpus):
    from ingest_ray.functions.dedup import (
        _MINHASH_SEEDS,
        minhash_matrix,
        shingle_hashes_batch,
    )
    from ingest_ray.util import splitmix64

    texts = corpus.column("text").to_pylist()
    flat, offs = shingle_hashes_batch(texts, 3, unique=False)
    sig = minhash_matrix(flat, offs, 32)
    for i in (0, 1, 7, len(texts) - 1):
        seg = flat[offs[i] : offs[i + 1]]
        for j in (0, 5, 31):
            want = (
                int(splitmix64(seg ^ _MINHASH_SEEDS[j]).min())
                if len(seg)
                else 0xFFFFFFFFFFFFFFFF
            )
            assert int(sig[i, j]) == want


def test_shingle_hashes_unique_are_sets(corpus):
    from ingest_ray.functions.dedup import shingle_hashes_batch

    texts = corpus.column("text").to_pylist()
    flat, offs = shingle_hashes_batch(texts, 3, unique=True)
    for i in range(len(texts)):
        seg = flat[offs[i] : offs[i + 1]]
        assert len(np.unique(seg)) == len(seg)


def test_distributed_verify_equals_broadcast(ray_session, corpus):
    import ray.data as rd

    from ingest_ray.functions.dedup import (
        minhash_lsh_candidates,
        verify_jaccard_pairs,
        verify_jaccard_pairs_distributed,
    )

    docs = rd.from_arrow(corpus)
    cands = minhash_lsh_candidates(docs, num_hashes=64, bands=16).materialize()
    vb = (
        verify_jaccard_pairs(cands, corpus, threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    vd = (
        verify_jaccard_pairs_distributed(cands, docs, threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert vb[["a", "b"]].equals(vd[["a", "b"]])
    assert np.allclose(vb["jaccard"], vd["jaccard"])
    assert len(vb) > 0
    # force the no-id-filter fallback (over-threshold path): the full
    # sketch shuffle must produce the same output with zero driver
    # materialization of the candidate id set
    vf = (
        verify_jaccard_pairs_distributed(cands, docs, threshold=0.5, max_filter_ids=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert vb[["a", "b"]].equals(vf[["a", "b"]])
    assert np.allclose(vb["jaccard"], vf["jaccard"])


def test_dedup_assign_invariants(ray_session, corpus):
    import ray.data as rd

    from ingest_ray.functions.dedup import (
        minhash_dedup_assign,
        minhash_lsh_candidates,
        verify_jaccard_pairs,
    )

    docs = rd.from_arrow(corpus)
    assign = minhash_dedup_assign(docs, threshold=0.5).to_pandas()
    m = dict(zip(assign["doc_id"], assign["keep_id"]))
    ids = corpus.column("doc_id").to_pylist()
    texts = corpus.column("text").to_pylist()
    assert set(m) == set(ids)  # every doc assigned
    by_text = {}
    for i, t in zip(ids, texts):
        by_text.setdefault(t, []).append(i)
    for group in by_text.values():  # exact dups share a cluster
        assert len({m[g] for g in group}) == 1
    # keep_id is a real doc id and the min of its own cluster
    clusters = {}
    for d, k in m.items():
        clusters.setdefault(k, []).append(d)
    for k, members in clusters.items():
        assert k == min(members)
    # verified near-dup pairs are co-clustered
    cands = minhash_lsh_candidates(docs, num_hashes=64, bands=16)
    vb = verify_jaccard_pairs(cands, corpus, threshold=0.5).to_pandas()
    for a, b in zip(vb["a"], vb["b"]):
        assert m[a] == m[b]


def test_ivf_ann_recall(ray_session):
    """IVF (Dataset corpus, centroid-keyed shuffle) must reach high
    recall vs the exact brute-force baseline on clustered embeddings."""
    import ray.data as rd

    from ingest_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16))
    vecs = []
    for i in range(400):
        vecs.append(centers[i % 8] + 0.1 * rng.standard_normal(16))
    mat = np.asarray(vecs, dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(400), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat], pa.list_(pa.float32())),
        }
    )
    corpus = rd.from_arrow(tbl)
    queries = rd.from_arrow(tbl.slice(0, 10))
    exact = brute_force_topk(corpus, tbl.slice(0, 10), k=5).to_pandas()
    approx = ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4, train_sample=400).to_pandas()
    e = {(r.qid, r.vec_id) for r in exact.itertuples()}
    a = {(r.qid, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_embedding_lsh_pairs_subset_and_recall(ray_session):
    """LSH-bucketed embedding near-dup: every emitted pair must be a
    TRUE pair (exact in-bucket verification → no false positives) and
    measured recall vs the brute-force kernel must clear the standard
    LSH bound comfortably at the defaults."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ingest_ray.functions.dedup import embedding_near_pairs, embedding_near_pairs_lsh

    table = pq.read_table(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ds = rd.from_arrow(table)
    # the synthetic embeddings are near-orthogonal: true pairs only
    # exist at threshold 0.4 (59 of them), so band geometry is tuned
    # for p = 1-acos(0.4)/pi ~ 0.63: r=3, b=12 -> theoretical recall
    # 1-(1-p^3)^12 ~ 0.97
    exact = {
        (int(r["a"]), int(r["b"]))
        for r in embedding_near_pairs(ds, table, threshold=0.4).take_all()
    }
    got = {
        (int(r["a"]), int(r["b"]))
        for r in embedding_near_pairs_lsh(
            ds, threshold=0.4, bits_per_band=3, num_bands=12
        ).take_all()
    }
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    assert len(exact) > 0
    recall = len(got) / len(exact)
    assert recall >= 0.8, f"recall {recall:.3f} over {len(exact)} true pairs"


def test_label_propagation_equals_union_find(ray_session, corpus):
    """Forcing the distributed label-propagation path (threshold 0)
    must produce the same cluster assignment as the driver union-find."""
    import pandas as pd
    import ray.data as rd

    from ingest_ray.functions.dedup import minhash_dedup_assign

    docs = rd.from_arrow(corpus)
    uf = (
        minhash_dedup_assign(docs, threshold=0.5, lp_edge_threshold=None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp = (
        minhash_dedup_assign(docs, threshold=0.5, lp_edge_threshold=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(uf, lp)


def test_label_propagation_long_chain_converges(ray_session):
    """A chain whose diameter far exceeds max_iters must still converge
    (pointer jumping gives O(log diameter) rounds) — plain propagation
    would silently mislabel most of the chain."""
    import ray.data as rd

    from ingest_ray.functions.dedup import label_propagation_components

    n = 300  # diameter 299 >> max_iters=20
    a = np.arange(n - 1, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(a + 1)})).repartition(4)
    got = label_propagation_components(edges, max_iters=20).to_pandas()
    assert set(got["label"]) == {0}
    assert len(got) == n


def test_label_propagation_raises_on_nonconvergence(ray_session):
    """Exhausting the iteration budget must raise, not return split
    components."""
    import ray.data as rd

    from ingest_ray.functions.dedup import label_propagation_components

    n = 64
    a = np.arange(n - 1, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(a + 1)}))
    with pytest.raises(RuntimeError, match="did not converge"):
        label_propagation_components(edges, max_iters=1)


def test_dedup_pair_keys_past_32bit(ray_session, corpus):
    """Doc ids above 2³² through candidates → verify → assign: the pair
    plumbing must not pack ids into 32-bit halves. The big-id corpus
    (ids + 5·2³²) must produce exactly the small-id results shifted."""
    import ray.data as rd

    from ingest_ray.functions.dedup import (
        minhash_dedup_assign,
        minhash_lsh_candidates,
        verify_jaccard_pairs_distributed,
    )

    off = 5 << 32
    ids = corpus.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    big = pa.table(
        {"doc_id": pa.array(ids + off, pa.int64()), "text": corpus.column("text")}
    )
    docs_s = rd.from_arrow(corpus)
    docs_b = rd.from_arrow(big)

    cand_s = minhash_lsh_candidates(docs_s, num_hashes=64, bands=16).materialize()
    cand_b = minhash_lsh_candidates(docs_b, num_hashes=64, bands=16).materialize()
    ps = {(int(r["a"]), int(r["b"])) for r in cand_s.take_all()}
    pb = {(int(r["a"]) - off, int(r["b"]) - off) for r in cand_b.take_all()}
    assert ps == pb and len(ps) > 0

    vs = {
        (int(r["a"]), int(r["b"]))
        for r in verify_jaccard_pairs_distributed(cand_s, docs_s, threshold=0.5).take_all()
    }
    vb = {
        (int(r["a"]) - off, int(r["b"]) - off)
        for r in verify_jaccard_pairs_distributed(cand_b, docs_b, threshold=0.5).take_all()
    }
    assert vs == vb and len(vs) > 0

    asg_s = minhash_dedup_assign(docs_s, threshold=0.5).to_pandas()
    asg_b = minhash_dedup_assign(docs_b, threshold=0.5).to_pandas()
    ms = dict(zip(asg_s["doc_id"], asg_s["keep_id"]))
    mb = {int(d) - off: int(k) - off for d, k in zip(asg_b["doc_id"], asg_b["keep_id"])}
    assert ms == mb


def test_label_propagation_components_random_graph(ray_session):
    """LP labels equal brute-force connected components on random graphs."""
    import ray.data as rd

    from ingest_ray.functions.dedup import label_propagation_components

    rng = np.random.default_rng(5)
    n_nodes, n_edges = 200, 150
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(4)
    got = label_propagation_components(edges).to_pandas()
    # brute force union-find
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comp_min = {}
    touched = set(a.tolist()) | set(b.tolist())
    for v in touched:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in touched}
    gm = dict(zip(got["node"], got["label"]))
    assert gm == want


def _brute_span_dedup(docs, window, delim_join=" "):
    """Reference span dedup: dict-ordered first occurrence."""
    spans = []
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(0, max(len(toks), 1), window):
            spans.append((doc_id, i // window, " ".join(toks[i : i + window])))
    spans.sort(key=lambda r: (r[0], r[1]))
    seen = set()
    kept = {}
    for doc_id, ordn, span in spans:
        if span in seen:
            continue
        seen.add(span)
        kept.setdefault(doc_id, []).append((ordn, span))
    out = {}
    for doc_id, rows in kept.items():
        rows.sort()
        out[doc_id] = (delim_join.join(s for _, s in rows), len(rows))
    return out


def test_dedup_spans_window_matches_brute(ray_session):
    import ray.data as rd

    from ingest_ray.functions.span_dedup import dedup_spans

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (int(i), " ".join(rng.choice(vocab, rng.integers(1, 15))))
        for i in range(80)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(6)
    got = dedup_spans(ds, window=3).to_pandas()
    want = _brute_span_dedup(docs, window=3)
    gm = {int(r.doc_id): (r.text, int(r.n_kept)) for r in got.itertuples()}
    assert gm == want


def test_dedup_spans_delimiter_mode(ray_session):
    """Line-delimiter mode: duplicate lines vanish except first."""
    import ray.data as rd

    from ingest_ray.functions.span_dedup import dedup_spans

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["hello\nworld\nhello", "world\nnew line", "new line\nunique"]
                ),
            }
        )
    )
    got = dedup_spans(ds, delimiter="\n").to_pandas()
    gm = {int(r.doc_id): (r.text, int(r.n_kept)) for r in got.itertuples()}
    assert gm == {
        1: ("hello\nworld", 2),
        2: ("new line", 1),
        3: ("unique", 1),
    }


def test_dedup_spans_doc_losing_all_spans_dropped(ray_session):
    import ray.data as rd

    from ingest_ray.functions.span_dedup import dedup_spans

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b", "a b"]),
            }
        )
    )
    got = dedup_spans(ds, window=2).to_pandas()
    assert got["doc_id"].tolist() == [1]
    assert got["text"].tolist() == ["a b"]


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_rep_broadcast_paths_equal():
    """The broadcast rep-attachment (hash→rep map ray.put once) and the
    distributed-join fallback (rep_broadcast_limit=0) must produce the
    identical (doc_id, keep_id) assignment."""
    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.functions.dedup import minhash_dedup_assign

    texts = (
        ["alpha beta gamma delta epsilon zeta"] * 4
        + ["alpha beta gamma delta epsilon eta"] * 3
        + ["one two three four five six seven eight"] * 2
        + [f"unique doc number {i} with its own words entirely" for i in range(12)]
    )
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    ds = rd.from_arrow(docs)

    def sig(out):
        return sorted((r["doc_id"], r["keep_id"]) for r in out.take_all())

    a = sig(minhash_dedup_assign(ds, threshold=0.5))
    b = sig(minhash_dedup_assign(ds, threshold=0.5, rep_broadcast_limit=0))
    assert a == b and len(a) == len(texts)
