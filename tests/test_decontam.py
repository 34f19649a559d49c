"""Benchmark decontamination: the broadcast path must equal the
distributed path, both must equal a brute-force Python reference, and
hit counts must reflect DISTINCT matching n-grams per document."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_docs(n_docs=120, vocab=40, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n_tok = int(rng.integers(2, 60))
        toks = [f"w{int(t)}" for t in rng.integers(0, vocab, n_tok)]
        rows.append((i, " ".join(toks)))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _brute(docs: pa.Table, bench: pa.Table, n: int) -> pd.DataFrame:
    def grams(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bl = set()
    for t in bench.column("text").to_pylist():
        bl |= grams(t)
    out = []
    for did, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        hits = len(grams(t) & bl)
        if hits:
            out.append((did, hits))
    return (
        pd.DataFrame(out, columns=["doc_id", "n_hits"])
        .astype({"doc_id": "int64", "n_hits": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run(ds_docs, ds_bench, n, **kw):
    from ingest_ray.functions.decontam import decontaminate

    df = decontaminate(ds_docs, ds_bench, n=n, **kw).to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hits": pd.Series(dtype="int64")})
    return (
        df.astype({"doc_id": "int64", "n_hits": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("n", [3, 8])
def test_decontaminate_matches_brute_force(ray_session, n):
    import ray.data as rd

    docs = _mk_docs()
    bench = docs.filter(
        pa.compute.equal(pa.compute.bit_wise_and(docs.column("doc_id"), 7), 0)
    )
    expect = _brute(docs, bench, n)
    got = _run(rd.from_arrow(docs), rd.from_arrow(bench), n)
    pd.testing.assert_frame_equal(got, expect)


def test_distributed_path_equals_broadcast(ray_session):
    import ray.data as rd

    docs = _mk_docs(seed=23)
    bench = docs.slice(0, 10)
    a = _run(rd.from_arrow(docs), rd.from_arrow(bench), 4)
    b = _run(
        rd.from_arrow(docs), rd.from_arrow(bench), 4, broadcast_doc_limit=0
    )
    pd.testing.assert_frame_equal(a, b)
    # every blocklist doc LONG ENOUGH to have a gram hits itself
    long_enough = {
        did
        for did, t in zip(
            bench.column("doc_id").to_pylist(), bench.column("text").to_pylist()
        )
        if len(t.split(" ")) >= 4
    }
    assert long_enough <= set(a["doc_id"])


def test_short_docs_and_empty_blocklist(ray_session):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b", "x"], pa.string()),  # both shorter than n
        }
    )
    bench = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["a b c d"], pa.string())}
    )
    got = _run(rd.from_arrow(docs), rd.from_arrow(bench), 4)
    assert got.empty
