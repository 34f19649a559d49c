"""Conformance golden test — port of the reference's end-to-end test
(/root/reference/tests/ingest.rs:10-88) over the interleaved documents
input (FIXTURES.md §3): the decoded features must equal the pinned
expectations verbatim (ids ×3+k, f32 coords, earcut cells, labels).
"""

import numpy as np
import pytest

from ingest_ray import georender
from ingest_ray.config import EngineConfig
from ingest_ray.geom import earcut
from ingest_ray.pipeline import ingest_features
from ingest_ray.synth import golden_documents
from ingest_ray.tags import get_type

EXPECTED_LAKE_CELLS = [0, 1, 4, 5, 4, 1, 3, 0, 4, 6, 5, 1, 3, 4, 6, 6, 1, 2, 2, 3, 6]


def _f32(x):
    return float(np.float32(x))


def _run_golden(join_mode):
    import ray.data as rd

    docs = rd.from_arrow(golden_documents())
    cfg = EngineConfig(join_mode=join_mode, num_partitions=4)
    feats = ingest_features(docs, cfg)
    rows = sorted(feats.take_all(), key=lambda r: r["key"])
    return rows


def _assert_golden(rows):
    assert [r["key"] for r in rows] == [555 * 3 + 1, 700 * 3 + 2, 1312 * 3 + 0, 2000 * 3 + 0]

    park, lake, cafe, bus = rows

    # way 555 → Area leisure.park (tests/ingest.rs:57-63)
    ex_positions = [_f32(p) for p in [13.00, 37.00, 13.01, 37.01, 13.02, 37.00]]
    ex_cells = earcut(ex_positions, [], 2)
    f = georender.decode(park["payload"])
    assert f.id == 555 * 3 + 1
    assert f.kind == georender.KIND_AREA
    assert f.feature_type == get_type("leisure.park")
    assert f.positions == ex_positions
    assert f.cells == ex_cells
    assert f.labels == b"\x0e=triangle park\x00"
    assert (_f32(park["minx"]), _f32(park["maxx"])) == (_f32(13.00), _f32(13.02))
    assert (_f32(park["miny"]), _f32(park["maxy"])) == (_f32(37.00), _f32(37.01))

    # relation 700 → Area natural.water with hole (tests/ingest.rs:64-73)
    ex_lake_pos = [
        _f32(p)
        for p in [
            5.000, -10.000, 5.000, -10.010, 5.010, -10.010, 5.010, -10.000,
            5.005, -10.003, 5.006, -10.004, 5.007, -10.003,
        ]
    ]
    f = georender.decode(lake["payload"])
    assert f.id == 700 * 3 + 2
    assert f.kind == georender.KIND_AREA
    assert f.feature_type == get_type("natural.water")
    assert f.positions == ex_lake_pos
    assert f.cells == EXPECTED_LAKE_CELLS
    assert f.labels == b"\x0a=cool lake\x00"
    assert (_f32(lake["minx"]), _f32(lake["maxx"])) == (_f32(5.000), _f32(5.010))
    assert (_f32(lake["miny"]), _f32(lake["maxy"])) == (_f32(-10.010), _f32(-10.000))

    # node 1312 → Point amenity.cafe (tests/ingest.rs:74-79)
    f = georender.decode(cafe["payload"])
    assert f.id == 1312 * 3
    assert f.kind == georender.KIND_POINT
    assert f.feature_type == get_type("amenity.cafe")
    assert f.point == (_f32(13.02), _f32(37.00))
    assert f.labels == b"\x00"

    # node 2000 → Point amenity.bus_station (tests/ingest.rs:80-85)
    f = georender.decode(bus["payload"])
    assert f.id == 2000 * 3
    assert f.feature_type == get_type("amenity.bus_station")
    assert f.point == (_f32(13.03), _f32(37.03))
    assert f.labels == b"\x00"


@pytest.mark.parametrize("join_mode", ["broadcast", "shuffle"])
def test_golden_corpus(ray_session, join_mode):
    rows = _run_golden(join_mode)
    _assert_golden(rows)


def test_golden_micro_degenerate(ray_session):
    """FIXTURES.md §4 — join-miss / degenerate paths all drop."""
    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.spans import DOCUMENTS_SCHEMA, serialize_node, serialize_relation, serialize_way

    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "doc-micro",
                "spans": [
                    {"kind": "node", "text": serialize_node(1312, 13, 37, []), "media_ref": "", "offset": 0},
                    {"kind": "way", "text": serialize_way(555, [600, 601, 602], [("leisure", "park")]), "media_ref": "", "offset": 1},
                    {
                        "kind": "relation",
                        "text": serialize_relation(700, [("way", "outer", 701)], [("type", "multipolygon"), ("natural", "water")]),
                        "media_ref": "",
                        "offset": 2,
                    },
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    feats = ingest_features(rd.from_arrow(docs), EngineConfig(join_mode="broadcast", num_partitions=2))
    assert feats.count() == 0
