"""Conformance tests for the vectorized hot paths: each fast path must
equal its per-row reference implementation exactly."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ingest_ray import georender, joins
from ingest_ray.elements import parse_all_batch, parse_kind_batch
from ingest_ray.spans import explode_spans, parse_geo_span
from ingest_ray.synth import DOCUMENTS_SCHEMA, _span, golden_documents, synth_documents
from ingest_ray.util import splitmix64


def test_parse_vectorized_equals_row_oracle():
    for tbl in (golden_documents(), synth_documents(3000)):
        for kind in ("node", "way", "relation"):
            vec = parse_kind_batch(tbl, kind).to_pylist()
            spans = explode_spans(tbl)
            spans = spans.filter(pc.equal(spans.column("kind"), kind))
            oracle = [parse_geo_span(kind, t) for t in spans.column("text").to_pylist()]
            assert len(vec) == len(oracle)
            for a, b in zip(vec, oracle):
                assert a["id"] == b["id"]
                assert [(t["key"], t["value"]) for t in a["tags"]] == b["tags"]
                if kind == "node":
                    assert (a["lon"], a["lat"]) == (b["lon"], b["lat"])
                elif kind == "way":
                    assert a["refs"] == b["refs"]
                else:
                    assert [(m["mtype"], m["role"], m["ref"]) for m in a["members"]] == [
                        (m["mtype"], m["role"], m["ref"]) for m in b["members"]
                    ]


def test_parse_all_union_covers_kinds():
    t = parse_all_batch(synth_documents(500))
    kinds = set(t.column("ekind").to_pylist())
    assert kinds == {0, 1, 2}
    for kind, code in (("node", 0), ("way", 1), ("relation", 2)):
        per = parse_kind_batch(synth_documents(500), kind)
        sub = t.filter(pc.equal(t.column("ekind"), code))
        assert len(per) == len(sub)
        assert per.column("id").to_pylist() == sub.column("id").to_pylist()


def test_point_encoder_vectorized_roundtrip():
    fids = np.array([0, 1, 127, 128, 300, 2**40, 9_000_000_030], dtype=np.uint64)
    lon = np.array([0.0, 13.02, -179.99, 5.0, 139.5, 1.5, -0.25], dtype=np.float32)
    lat = np.array([0.0, 37.0, 89.99, -10.0, 35.5, -2.5, 0.125], dtype=np.float32)
    ftypes = np.array([1, 20, 127, 128, 500, 1000, 77], dtype=np.uint64)
    labels = [b"\x00", b"\x0e=triangle park\x00", b"\x00", b"\x05=ab\xc3\xa9\x00", b"\x00", b"\x00", b"\x00"]
    flat, offs = georender.encode_points_vec(fids, lon, lat, ftypes, labels)
    buf = flat.tobytes()
    for i in range(len(fids)):
        got = buf[offs[i] : offs[i + 1]]
        want = georender.encode_point(
            int(fids[i]), (float(lon[i]), float(lat[i])), int(ftypes[i]), labels[i]
        )
        assert got == want
        f = georender.decode(got)
        assert f.id == int(fids[i]) and f.feature_type == int(ftypes[i])


def test_wrap_documents_equals_row_builder():
    def wrap_old(geo_spans, spans_per_doc=4):
        docs = []
        for d in range(0, len(geo_spans), spans_per_doc):
            doc_id = f"doc-{d // spans_per_doc:06d}"
            chunk = geo_spans[d : d + spans_per_doc]
            h = int(splitmix64(np.uint64(d // spans_per_doc))) % 3
            spans = []
            offset = 0
            for j, (kind, text) in enumerate(chunk):
                if j % 3 == h:
                    filler = f"interleaved text #{d + j}"
                    spans.append(_span("text", filler, "", offset))
                    offset += len(filler)
                if (j + d) % 7 == 6:
                    spans.append(
                        _span("media", "", f"media://{splitmix64(np.uint64(d + j)):016x}", offset)
                    )
                spans.append(_span(kind, text, "", offset))
                offset += len(text)
            docs.append({"doc_id": doc_id, "spans": spans})
        return pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)

    from ingest_ray.synth import _wrap_documents

    import random

    random.seed(7)
    for n in (1, 3, 17, 400):
        geo = [("node", f"node|id={i}|lon=1.0|lat=2.0|tags=") for i in range(n)]
        assert _wrap_documents(geo).equals(wrap_old(geo))


@pytest.mark.usefixtures("ray_session")
def test_sharded_indexes_equal_driver_indexes():
    import ray
    import ray.data as rd

    from ingest_ray.elements import elements_all_dataset, kind_view

    docs = rd.from_arrow(synth_documents(5000))
    all_el = elements_all_dataset(docs).materialize()
    nodes = kind_view(all_el, "node")
    ways = kind_view(all_el, "way")

    di = ray.get(joins.build_node_index(nodes))
    si = ray.get(joins.build_node_index_sharded(nodes))
    keys = np.array([10, 50, 49_990, 50_000, -4, 7, 123457], dtype=np.int64)
    fd, (lod, lad) = di.lookup(keys)
    fs, (los, las) = si.lookup(keys)
    assert (fd == fs).all()
    assert np.allclose(lod[fd], los[fd]) and np.allclose(lad[fd], las[fd])

    dw = ray.get(joins.build_way_refs_index(ways))
    sw = ray.get(joins.build_way_refs_index_sharded(ways))
    way_tbl = pa.concat_tables(
        list(ways.select_columns(["id"]).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    )
    wkeys = np.concatenate(
        [way_tbl.column("id").to_numpy(zero_copy_only=False)[:50], [-1, 0, 10**15]]
    ).astype(np.int64)
    f1, c1, g1 = dw.lookup_refs(wkeys)
    f2, c2, g2 = sw.lookup_refs(wkeys)
    assert (f1 == f2).all() and (c1 == c2).all() and (g1 == g2).all()


def test_geom_encoder_vectorized_roundtrip():
    """encode_geoms_vec must emit the exact scalar encode_line /
    encode_area byte grammar for a mixed line/area batch."""
    import numpy as np
    import pyarrow as pa

    from ingest_ray import georender

    rng = np.random.default_rng(7)
    n = 64
    fids = (rng.integers(1, 1 << 40, n) * 3 + 1).astype(np.uint64)
    ftypes = rng.integers(0, 300, n).astype(np.uint64)
    kinds = np.where(rng.random(n) < 0.5, georender.KIND_AREA, georender.KIND_LINE).astype(
        np.uint8
    )
    npts = rng.integers(2, 9, n)
    pos_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(npts, out=pos_offs[1:])
    pos_flat = rng.uniform(-180, 180, 2 * int(pos_offs[-1])).astype(np.float32)
    ncells = np.where(kinds == georender.KIND_AREA, rng.integers(0, 12, n), 0)
    cells_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ncells, out=cells_offs[1:])
    cells_flat = rng.integers(0, 1 << 20, int(cells_offs[-1])).astype(np.int64)
    labels = [bytes(rng.integers(1, 255, rng.integers(1, 9)).astype(np.uint8)) for _ in range(n)]
    lab_flat = np.frombuffer(b"".join(labels), dtype=np.uint8)
    lab_lens = np.array([len(b) for b in labels], dtype=np.int64)

    flat, offs = georender.encode_geoms_vec(
        fids, ftypes, kinds, pos_flat, pos_offs, cells_flat, cells_offs, lab_flat, lab_lens
    )
    blob = flat.tobytes()
    for i in range(n):
        got = blob[offs[i] : offs[i + 1]]
        pos = pos_flat[2 * pos_offs[i] : 2 * pos_offs[i + 1]].tolist()
        if kinds[i] == georender.KIND_AREA:
            want = georender.encode_area(
                int(fids[i]),
                int(ftypes[i]),
                pos,
                cells_flat[cells_offs[i] : cells_offs[i + 1]].tolist(),
                labels[i],
            )
        else:
            want = georender.encode_line(int(fids[i]), int(ftypes[i]), pos, labels[i])
        assert got == want, i


def test_is_area_vectorized_equals_scalar():
    """ways_are_area_vec / relations_are_area_vec vs the scalar rules on
    randomized tag/ref combinations (incl. area=yes/no overrides and
    per-key exception values)."""
    import numpy as np
    import pyarrow as pa

    from ingest_ray.osm_area import (
        relation_is_area,
        relations_are_area_vec,
        way_is_area,
        ways_are_area_vec,
    )

    rng = np.random.default_rng(11)
    keys = ["building", "leisure", "natural", "waterway", "highway", "area", "name", "type"]
    vals = ["yes", "no", "track", "coastline", "riverbank", "platform", "multipolygon", "x"]
    tag_lists, ref_lists = [], []
    for _ in range(400):
        ntags = int(rng.integers(0, 5))
        tag_lists.append(
            [
                {"key": keys[rng.integers(len(keys))], "value": vals[rng.integers(len(vals))]}
                for _ in range(ntags)
            ]
        )
        nr = int(rng.integers(0, 7))
        refs = rng.integers(1, 6, nr).tolist()
        if nr >= 4 and rng.random() < 0.5:
            refs[-1] = refs[0]
        ref_lists.append(refs)
    tags_col = pa.array(
        tag_lists,
        pa.list_(pa.struct([pa.field("key", pa.string()), pa.field("value", pa.string())])),
    )
    offs = np.zeros(len(ref_lists) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in ref_lists], out=offs[1:])
    flat = np.array([x for r in ref_lists for x in r], dtype=np.int64)
    got_w = ways_are_area_vec(tags_col, offs, flat)
    got_r = relations_are_area_vec(tags_col)
    for i, (tl, rl) in enumerate(zip(tag_lists, ref_lists)):
        pairs = [(t["key"], t["value"]) for t in tl]
        assert got_w[i] == way_is_area(pairs, rl), (i, pairs, rl)
        assert got_r[i] == relation_is_area(pairs), (i, pairs)


def test_combined_sharded_indexes_equal_driver(ray_session):
    """build_sharded_indexes_from_all (kind-filtered mixed blocks) must
    answer lookups identically to the driver-collect indexes."""
    import numpy as np
    import ray
    import ray.data as rd

    from ingest_ray import joins
    from ingest_ray.elements import elements_all_dataset, kind_view
    from ingest_ray.synth import synth_documents

    docs = rd.from_arrow(synth_documents(30_000))
    all_el = elements_all_dataset(docs).materialize()
    n_ref, w_ref = joins.build_sharded_indexes_from_all(all_el, True)
    n_drv = ray.get(joins.build_node_index(kind_view(all_el, "node")))
    w_drv = ray.get(joins.build_way_refs_index(kind_view(all_el, "way")))
    n_cmb = ray.get(n_ref)
    w_cmb = ray.get(w_ref)

    keys = np.arange(0, 40_000, 7, dtype=np.int64) * 10
    f1, (lo1, la1) = n_cmb.lookup(keys)
    f2, (lo2, la2) = n_drv.lookup(keys)
    assert np.array_equal(f1, f2)
    assert np.allclose(lo1[f1], lo2[f2]) and np.allclose(la1[f1], la2[f2])

    wkeys = np.arange(10_000_000_000, 10_000_030_000, 13, dtype=np.int64)
    g1, c1, r1 = w_cmb.lookup_refs(wkeys)
    g2, c2, r2 = w_drv.lookup_refs(wkeys)
    assert np.array_equal(g1, g2) and np.array_equal(c1, c2) and np.array_equal(r1, r2)


def test_lazy_relation_branch_equals_barrier_path(ray_session, monkeypatch):
    """The fused broadcast plan above SHARDED_INDEX_THRESHOLD sizes its
    relation branch from the index sweep's kind counts (no
    materialize+count barrier). Forcing that path on a small corpus
    must give the identical feature set to the driver-index path, and
    the sweep's counts must equal the real per-kind totals."""
    import pyarrow as pa
    import ray.data as rd

    from ingest_ray import joins
    from ingest_ray.config import EngineConfig
    from ingest_ray.elements import elements_all_dataset
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import synth_documents

    docs_tbl = synth_documents(20_000)
    docs = rd.from_arrow(docs_tbl)

    all_el = elements_all_dataset(docs).materialize()
    _n, _w, counts = joins.build_sharded_indexes_from_all(all_el, True, return_counts=True)
    import pyarrow.compute as pc

    el_tbl = pa.concat_tables(
        list(all_el.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    )
    for k in range(3):
        assert counts[k] == len(el_tbl.filter(pc.equal(el_tbl.column("ekind"), k)))

    def run():
        feats = ingest_features(rd.from_arrow(docs_tbl), EngineConfig(join_mode="auto"))
        return sorted(
            (r["key"], bytes(r["payload"])) for r in feats.take_all()
        )

    base = run()
    monkeypatch.setattr(joins, "SHARDED_INDEX_THRESHOLD", 1)
    forced = run()
    assert forced == base and len(base) > 0
