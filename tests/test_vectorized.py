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
