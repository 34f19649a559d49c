"""Unit tests for the kernel layer (SURVEY.md §5 strategy item 2)."""

import numpy as np
import pyarrow as pa

from ingest_ray import georender, tags
from ingest_ray.geom import bbox_reduceat, earcut, overlap_area, points_in_polygon
from ingest_ray.osm_area import relation_is_area, way_is_area
from ingest_ray.spans import explode_spans, parse_geo_span, serialize_node, serialize_way
from ingest_ray.util import varint_decode, varint_encode


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63]:
        out = bytearray()
        varint_encode(v, out)
        got, off = varint_decode(bytes(out))
        assert got == v and off == len(out)


def test_earcut_golden_cells():
    pos = [float(np.float32(p)) for p in [
        5.000, -10.000, 5.000, -10.010, 5.010, -10.010, 5.010, -10.000,
        5.005, -10.003, 5.006, -10.004, 5.007, -10.003]]
    assert earcut(pos, [4], 2) == [0, 1, 4, 5, 4, 1, 3, 0, 4, 6, 5, 1, 3, 4, 6, 6, 1, 2, 2, 3, 6]


def test_earcut_square_and_triangle():
    assert earcut([0, 0, 0, 1, 1, 1, 1, 0], [], 2) == [1, 0, 3, 3, 2, 1]
    assert len(earcut([0, 0, 1, 0, 0.5, 1], [], 2)) == 3


def test_tags_classify_and_labels():
    t = tags.classify_one([("amenity", "cafe")])
    assert t == tags.get_type("amenity.cafe")
    assert tags.classify_one([]) == tags.place_other()
    assert tags.classify_one([("weird", "x")]) == tags.place_other()
    # unknown value of known key → key.other
    assert tags.classify_one([("amenity", "zzz_unknown")]) == tags.get_type("amenity.other")
    assert tags.pack_labels([("name", "triangle park")]) == b"\x0e=triangle park\x00"
    assert tags.pack_labels([]) == b"\x00"


def test_georender_roundtrip():
    p = georender.encode_point(42, (1.5, -2.5), 7, b"\x00")
    f = georender.decode(p)
    assert (f.id, f.kind, f.feature_type) == (42, georender.KIND_POINT, 7)
    assert georender.payload_id(p) == 42

    line = georender.encode_line(43, 8, [0.0, 0.0, 1.0, 1.0], b"\x00")
    f = georender.decode(line)
    assert f.positions == [0.0, 0.0, 1.0, 1.0]

    area = georender.encode_area(44, 9, [0, 0, 0, 1, 1, 1], [1, 0, 2], b"\x02=x\x00")
    f = georender.decode(area)
    assert f.cells == [1, 0, 2] and f.labels == b"\x02=x\x00"
    assert georender.payload_id(area) == 44


def test_is_area_rules():
    closed = [1, 2, 3, 1]
    assert way_is_area([("leisure", "park")], closed)
    assert not way_is_area([("leisure", "park")], [1, 2, 3])  # open
    assert not way_is_area([("highway", "primary")], closed)
    assert way_is_area([("highway", "primary"), ("area", "yes")], closed)
    assert not way_is_area([("building", "yes"), ("area", "no")], closed)
    assert not way_is_area([("natural", "coastline")], closed)
    assert relation_is_area([("type", "multipolygon")])
    assert not relation_is_area([("type", "route")])


def test_span_roundtrip():
    s = serialize_node(1312, 13.02, 37.0, [("amenity", "cafe"), ("name", "x y")])
    el = parse_geo_span("node", s)
    # coords come back f32-narrowed (the engine's coordinate model)
    assert el["id"] == 1312 and el["lon"] == float(np.float32(13.02))
    assert ("name", "x y") in el["tags"]
    w = serialize_way(555, [1, 2, 3, 1], [("leisure", "park")])
    el = parse_geo_span("way", w)
    assert el["refs"] == [1, 2, 3, 1]


def test_explode_spans_order():
    from ingest_ray.spans import DOCUMENTS_SCHEMA

    docs = pa.Table.from_pylist(
        [
            {"doc_id": "a", "spans": [
                {"kind": "text", "text": "t0", "media_ref": "", "offset": 0},
                {"kind": "node", "text": "n", "media_ref": "", "offset": 1}]},
            {"doc_id": "b", "spans": [
                {"kind": "media", "text": "", "media_ref": "media://x", "offset": 0}]},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    t = explode_spans(docs)
    assert t.column("doc_id").to_pylist() == ["a", "a", "b"]
    assert t.column("span_idx").to_pylist() == [0, 1, 0]
    assert t.column("kind").to_pylist() == ["text", "node", "media"]


def test_overlap_area_f32():
    minx = np.array([0.0, 10.0], dtype=np.float32)
    miny = np.array([0.0, 10.0], dtype=np.float32)
    maxx = np.array([2.0, 12.0], dtype=np.float32)
    maxy = np.array([2.0, 12.0], dtype=np.float32)
    is_pt = np.array([False, False])
    a = overlap_area((0.0, 0.0, 1.0, 1.0), minx, miny, maxx, maxy, is_pt)
    assert a[0] == np.float32(1.0) and a[1] == 0.0
    # point semantics: inclusive edges → 1.0
    a = overlap_area((0.0, 0.0, 1.0, 1.0), np.array([1.0], np.float32), np.array([1.0], np.float32),
                     np.array([1.0], np.float32), np.array([1.0], np.float32), np.array([True]))
    assert a[0] == 1.0


def test_points_in_polygon_with_hole():
    ring = np.array([0, 0, 4, 0, 4, 4, 0, 4, 1, 1, 3, 1, 3, 3, 1, 3], dtype=np.float64)
    offsets = np.array([0, 4, 8])
    px = np.array([2.0, 0.5, 5.0])
    py = np.array([2.0, 0.5, 5.0])
    got = points_in_polygon(px, py, ring, offsets)
    assert got.tolist() == [False, True, False]  # center is in the hole


def test_bbox_reduceat():
    vals = np.array([0, 0, 1, 2, -1, 5, 3, 3], dtype=np.float32)
    offsets = np.array([0, 3, 4])
    out = bbox_reduceat(vals, offsets)
    assert out[0].tolist() == [-1.0, 0.0, 1.0, 5.0]
    assert out[1].tolist() == [3.0, 3.0, 3.0, 3.0]


def test_progress_tracker(ray_session):
    """A3 observer: wrapped stages report counts; rates appear after
    two samples; the data path is untouched."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.progress import ProgressTracker

    prog = ProgressTracker()
    ds = rd.range(1000, override_num_blocks=4)

    def double(b: pa.Table) -> pa.Table:
        return b

    out = ds.map_batches(prog.wrap(double, "double"), batch_format="pyarrow").materialize()
    assert out.count() == 1000
    # the counter adds are fire-and-forget remote calls: poll with a
    # deadline until they drain (a fixed sleep raced under suite load)
    deadline = time.monotonic() + 30.0
    s1 = prog.sample()
    while s1["counts"].get("double") != 1000 and time.monotonic() < deadline:
        time.sleep(0.1)
        s1 = prog.sample()
    assert s1["counts"].get("double") == 1000
    s2 = prog.sample()
    assert "double" in s2["rates_per_s"]
    lines = []
    with prog.observe(interval_s=0.05, emit=lines.append):
        time.sleep(0.15)
    assert len(lines) >= 2


def test_relation_blocks_sizing():
    from ingest_ray.pipeline import _relation_blocks

    # tiny input: one block, never zero
    assert _relation_blocks(1, 1024) == 1
    assert _relation_blocks(100, 1024) == 1
    # the measured 600k/32-CPU regime must land between per-task
    # overhead (586 tiny blocks) and straggler waves (37 fat ones);
    # exact value depends on cluster_cpus() but stays in [2*cpus-ish,
    # ceil(n/256)] and well under one-block-per-batch
    nb = _relation_blocks(600_000, 1024)
    assert 8 <= nb < 586
    # blocks never exceed what batch_size-sized blocks would give
    assert _relation_blocks(10_000, 1024) <= max(-(-10_000 // 1024), 64)


def test_asof_join_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from ingest_ray.functions.temporal import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "eid": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, 20, n_l).astype(np.int64),
            "t": rng.integers(0, 1000, n_l).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 25, n_r).astype(np.int64),
            "rt": rng.integers(0, 1000, n_r).astype(np.int64),
            "val": rng.integers(0, 10_000, n_r).astype(np.int64),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            key="k",
            left_ts="t",
            right_ts="rt",
            right_key="rk",
            right_cols=("val",),
            tie_col="val",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # brute force: per left row, the max-rt right row with rt <= t and
    # same key; ties on rt broken by max val (the operator's rule)
    rows = []
    for e, k, t in left.itertuples(index=False):
        cand = right[(right["rk"] == k) & (right["rt"] <= t)]
        if len(cand):
            best = cand.sort_values(["rt", "val"]).iloc[-1]
            rows.append((e, k, t, int(best["rt"]), int(best["val"])))
    want = pd.DataFrame(rows, columns=["eid", "k", "t", "rt", "val"])
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["eid", "k", "t", "rt", "val"]].astype("int64"), want.astype("int64")
    )


def test_range_join_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from ingest_ray.functions.temporal import range_join

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 400
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, 15, n_l).astype(np.int64),
            "t": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 18, n_r).astype(np.int64),
            "rt": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
            "val": np.arange(n_r, dtype=np.int64),
        }
    )
    lo, hi = -500 * 1_000_000, 250 * 1_000_000  # ±window in microseconds
    got = (
        range_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            key="k",
            left_ts="t",
            right_ts="rt",
            lo_offset=lo,
            hi_offset=hi,
            right_key="rk",
            right_cols=("val",),
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["lid", "val"])
        .reset_index(drop=True)
    )
    merged = left.merge(right, left_on="k", right_on="rk")
    m = (merged["rt"] >= merged["t"] + pd.Timedelta(microseconds=lo)) & (
        merged["rt"] <= merged["t"] + pd.Timedelta(microseconds=hi)
    )
    want = (
        merged[m][["lid", "k", "t", "rt", "val"]]
        .sort_values(["lid", "val"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["lid", "k", "t", "rt", "val"]], want)


def test_repetition_stats_brute(ray_session):
    """Integer repetition stats equal a per-doc Python reference."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.functions.repetition import repetition_stats

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(6)]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(1, 20)))) for i in range(60)]
    docs.append((60, ""))  # empty text edge: one empty token
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(5)
    got = repetition_stats(ds).to_pandas().set_index("doc_id")
    for doc_id, text in docs:
        toks = text.split(" ")
        bigrams = collections.Counter(zip(toks, toks[1:]))
        row = got.loc[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct_tokens"] == len(set(toks))
        assert row["top_bigram_count"] == (max(bigrams.values()) if bigrams else 0)
        assert row["n_bigrams"] == max(len(toks) - 1, 0)


def test_sever_lineage_identity_and_plan_length(ray_session):
    """sever_lineage must preserve rows exactly and rebase the plan
    so loop-carried materializes stay O(1) to plan (the Ray 2.49
    doubling-plan pathology pinned in util.sever_lineage's docstring)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.util import sever_lineage

    t = pa.table({"v": pa.array(np.arange(100, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    out = sever_lineage(ds)
    assert sorted(r["v"] for r in out.take_all()) == list(range(100))
    # a further map over the rebased dataset executes fine (blocks live)
    assert out.map_batches(lambda b: b, batch_format="pyarrow").count() == 100


def test_sever_lineage_block_loss_fails_loudly(ray_session):
    """The fault-tolerance tradeoff of sever_lineage, made explicit: the
    rebased dataset holds bare block refs with NO lineage, so a lost
    block is NOT recomputed — the read must surface an error (never
    silently drop rows). The recompute story for loop-carried state
    (label propagation, k-means) is caller-level: inputs upstream of
    the loop keep their lineage, every round is deterministic, so a
    failed round re-runs from the loop entry (documented in
    util.sever_lineage)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray
    import ray.data as rd

    from ingest_ray.util import sever_lineage

    t = pa.table({"v": pa.array(np.arange(100, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    refs = ds.to_arrow_refs()
    out = sever_lineage(ds)
    # simulate a worker/node loss: free one backing object
    ray._private.internal_api.free([refs[0]], local_only=False)
    with pytest.raises(Exception):
        # either the consuming task raises ObjectFreedError/ObjectLost
        # or Ray wraps it — any exception is the documented contract;
        # reconstruction would require the lineage this rebase dropped
        out.map_batches(lambda b: b, batch_format="pyarrow").count()


def test_parse_index_batch_equals_full_parse_projection():
    """The lean pass-1 parser must equal the (id, ekind, lon, lat,
    refs) projection of the full union parse, row for row."""
    from ingest_ray.elements import parse_all_batch, parse_index_batch
    from ingest_ray.synth import golden_documents, synth_documents

    for docs in (golden_documents(), synth_documents(4000)):
        full = parse_all_batch(docs).select(["id", "ekind", "lon", "lat", "refs"])
        lean = parse_index_batch(docs)
        assert full.schema.equals(lean.schema)
        assert full.equals(lean)


def test_write_corpus_atomic_and_idempotent(tmp_path):
    """Directory corpora appear only via rename (no partial state is
    ever visible at the final path) and a second call is a no-op."""
    import os

    from ingest_ray.synth import write_corpus

    p = str(tmp_path / "corpus_dir")
    out = write_corpus(p, 500, num_files=4)
    assert out == p and os.path.isdir(p) and not os.path.exists(p + ".tmp")
    parts = sorted(os.listdir(p))
    assert parts and all(f.endswith(".parquet") for f in parts)
    mtimes = {f: os.path.getmtime(os.path.join(p, f)) for f in parts}
    write_corpus(p, 500, num_files=4)  # idempotent: no rewrite
    assert {f: os.path.getmtime(os.path.join(p, f)) for f in parts} == mtimes

    single = str(tmp_path / "corpus.parquet")
    write_corpus(single, 300)
    assert os.path.isfile(single) and not os.path.exists(single + ".tmp")
