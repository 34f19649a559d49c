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


# Rounds 1-3 of the reference's o5c replication loop
# (/root/reference/tests/data/0/changeset{1,2,3}.xml, spec at
# tests/ingest.rs:150-400): island way creation + relation member add,
# node delete/create + way modify with two-hop propagation, and the
# castle round (stitched two-outer multipolygon + open-way Line).

from ingest_ray.changeset import GOLDEN_ROUND1 as ROUND1, GOLDEN_ROUND2 as ROUND2, GOLDEN_ROUND3 as ROUND3  # noqa: E501


@pytest.mark.usefixtures("ray_session")
def test_changeset_rounds_1_to_3():
    """Chained rounds 0-3: after each patch, the merged store must be
    BYTE-IDENTICAL to a fresh ingest of the manually-updated element
    corpus, and the reference's structural expectations must hold."""
    import ray.data as rd

    from ingest_ray.spans import serialize_node, serialize_relation, serialize_way
    from ingest_ray.synth import (
        GOLDEN_NODES,
        GOLDEN_RELATIONS,
        GOLDEN_WAYS,
        _wrap_documents,
        golden_documents,
    )
    from ingest_ray.tags import get_types

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(golden_documents())
    current = _collect(ingest_features(docs, cfg))

    nodes = {i: (lon, lat, tags) for i, lon, lat, tags in GOLDEN_NODES}
    ways = {i: (refs, tags) for i, refs, tags in GOLDEN_WAYS}
    rels = {i: (members, tags) for i, members, tags in GOLDEN_RELATIONS}

    def apply_manual(changes):
        for c in changes:
            e = c["element"]
            store = {"node": nodes, "way": ways, "relation": rels}[c["kind"]]
            if c["op"] == "delete":
                store.pop(e["id"], None)
            elif c["kind"] == "node":
                store[e["id"]] = (e["lon"], e["lat"], e.get("tags", []))
            elif c["kind"] == "way":
                store[e["id"]] = (e["refs"], e.get("tags", []))
            else:
                members = [(m["mtype"], m["role"], m["ref"]) for m in e["members"]]
                store[e["id"]] = (members, e.get("tags", []))

    def fresh_features():
        geo = [("node", serialize_node(i, lo, la, t)) for i, (lo, la, t) in sorted(nodes.items())]
        geo += [("way", serialize_way(i, r, t)) for i, (r, t) in sorted(ways.items())]
        geo += [("relation", serialize_relation(i, m, t)) for i, (m, t) in sorted(rels.items())]
        return _collect(ingest_features(rd.from_arrow(_wrap_documents(geo, spans_per_doc=4)), cfg))

    def by_key(tbl):
        return {r["key"]: r for r in tbl.to_pylist()}

    state = None
    for rnd, changes in enumerate((CHANGES0, ROUND1, ROUND2, ROUND3)):
        apply_manual(changes)
        delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
        delta_t = _collect(delta) if delta is not None else current.schema.empty_table()
        current = merge_features(current, delta_t, removed)
        got = sorted((r["key"], bytes(r["payload"])) for r in current.to_pylist())
        want = sorted((r["key"], bytes(r["payload"])) for r in fresh_features().to_pylist())
        assert got == want, f"round {rnd}: patched store != fresh ingest"

    rows = by_key(current)
    types = get_types()
    # round 1+2 island way: place.island area over the post-round-2 ring
    island = rows[602 * 3 + 1]
    assert island["ftype"] == types["place.island"]
    assert np.float32(island["minx"]) == np.float32(5.003)
    assert np.float32(island["miny"]) == np.float32(-10.008)
    # lake re-encoded twice (member add, then member-way node swap):
    # outer + 2 holes, renamed label
    lake = rows[700 * 3 + 2]
    assert bytes(lake["labels"]) == b"\x0a=Cool Lake\x00"
    assert len(lake["ring_offsets"]) == 4  # [0, outer, +inner1, +inner2]
    lake_pos = np.array(lake["positions"], dtype=np.float32).reshape(-1, 2)
    assert any(np.array_equal(p, np.array([5.003, -10.008], dtype=np.float32)) for p in lake_pos)
    # round 2 boat rental point
    boat = rows[9104 * 3 + 0]
    assert boat["ftype"] == types["amenity.other"]  # boat_rental -> curated-key fallback
    # round 3 castle wall: OPEN tagged way stays a Line
    wall = rows[4003 * 3 + 1]
    assert wall["kind"] == georender.KIND_LINE
    assert wall["ftype"] == types["historic.castle_wall"]
    assert np.float32(wall["minx"]) == np.float32(6.998)
    assert np.float32(wall["maxy"]) == np.float32(15.022)
    # round 3 castle: two outer members stitch into one ring + one hole
    castle = rows[4004 * 3 + 2]
    assert castle["kind"] == georender.KIND_AREA
    assert castle["ftype"] == types["historic.castle"]
    assert len(castle["ring_offsets"]) == 3  # stitched outer + inner
    assert np.float32(castle["minx"]) == np.float32(7.000)
    assert np.float32(castle["maxy"]) == np.float32(15.020)
    # untagged member ways emit no features of their own
    assert 4000 * 3 + 1 not in rows and 4002 * 3 + 1 not in rows


@pytest.mark.usefixtures("ray_session")
def test_osm_change_xml_rounds_match_dict_rounds():
    """Parsing the reference's own osmChange fixture files must produce
    the same final store as the hand-written round dicts."""
    import ray.data as rd

    from ingest_ray.changeset import parse_osm_change_xml

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(__import__("ingest_ray.synth", fromlist=["golden_documents"]).golden_documents())

    def run(rounds):
        current = _collect(ingest_features(docs, cfg))
        state = None
        for changes in rounds:
            delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
            delta_t = _collect(delta) if delta is not None else current.schema.empty_table()
            current = merge_features(current, delta_t, removed)
        return sorted((r["key"], bytes(r["payload"])) for r in current.to_pylist())

    xml_rounds = []
    for i in range(4):
        with open(f"/root/reference/tests/data/0/changeset{i}.xml") as f:
            xml_rounds.append(parse_osm_change_xml(f.read()))
    from ingest_ray.changeset import GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3

    assert run(xml_rounds) == run([CHANGES0, GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("divide", ["exact", "aggregated"])
def test_patch_tiles_rounds_match_fresh_store(tmp_path, divide):
    """Rounds 0-3 applied to a COMMITTED tile store via
    checkpoint.patch_tiles must byte-match a fresh optimize_to_tiles of
    the final corpus — for stores written by BOTH divide strategies —
    and incremental rounds must not rewrite untouched cells' tile
    files."""
    import os

    import ray.data as rd

    from ingest_ray.changeset import GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3
    from ingest_ray.checkpoint import optimize_to_tiles, patch_tiles, read_tiles

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(golden_documents())
    store = str(tmp_path / "store")
    feats = ingest_features(docs, cfg)
    current = _collect(feats)
    optimize_to_tiles(
        rd.from_arrow(current), store, grid_divs=(4, 4), leaf_capacity=2,
        resume=False, divide=divide,
    ).materialize()

    def tile_files(root):
        out = {}
        troot = os.path.join(root, "tiles")
        for dirpath, _dirs, names in os.walk(troot):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, troot)] = p
        return out

    state = None
    saw_incremental = False
    for rnd, changes in enumerate(
        (CHANGES0, GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3)
    ):
        before = {rel: os.stat(p).st_mtime_ns for rel, p in tile_files(store).items()}
        delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
        delta_t = _collect(delta) if delta is not None else current.schema.empty_table()
        current = merge_features(current, delta_t, removed)
        res = patch_tiles(store, delta_t, removed, leaf_capacity=2)
        if not res["full_rebuild"]:
            saw_incremental = True
            touched_cells = set(res["rewritten"]) | set(res["removed_cells"])
            for rel, p in tile_files(store).items():
                cell = int(rel.split(os.sep)[0][1:])
                if cell not in touched_cells and rel in before:
                    assert os.stat(p).st_mtime_ns == before[rel], (
                        f"round {rnd}: untouched cell {cell} file {rel} rewritten"
                    )

        fresh = str(tmp_path / f"fresh{rnd}")
        optimize_to_tiles(
            rd.from_arrow(current), fresh, grid_divs=(4, 4), leaf_capacity=2,
            resume=False, divide=divide,
        ).materialize()
        pf = tile_files(store)
        ff = tile_files(fresh)
        assert set(pf) == set(ff), f"round {rnd}: tile file sets differ"
        for rel in pf:
            with open(pf[rel], "rb") as a, open(ff[rel], "rb") as b:
                assert a.read() == b.read(), f"round {rnd}: {rel} bytes differ"
        got = sorted(
            (r["key"], r["tile_cell"], r["tile_path"])
            for r in read_tiles(store).take_all()
        )
        want = sorted(
            (r["key"], r["tile_cell"], r["tile_path"])
            for r in read_tiles(fresh).take_all()
        )
        assert got == want
    assert saw_incremental


@pytest.mark.usefixtures("ray_session")
def test_patch_tiles_empties_store(tmp_path):
    """A patch that removes EVERY key must empty the store cleanly
    (removed_cells reported, tiles+manifests gone) instead of entering
    the full-rebuild path with an empty corpus."""
    import os

    import ray.data as rd

    from ingest_ray.checkpoint import optimize_to_tiles, patch_tiles

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(golden_documents())
    feats = _collect(ingest_features(docs, cfg))
    store = str(tmp_path / "store")
    optimize_to_tiles(
        rd.from_arrow(feats), store, grid_divs=(4, 4), leaf_capacity=2, resume=False
    ).materialize()
    all_keys = feats.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
    res = patch_tiles(store, None, all_keys, leaf_capacity=2)
    assert res["full_rebuild"] is False
    assert res["rewritten"] == []
    assert len(res["removed_cells"]) > 0
    assert os.listdir(os.path.join(store, "tiles")) == []


def test_parse_o5c_equals_xml_fixtures():
    """The o5c BINARY fixtures must parse to the same change sets as
    their XML twins (o5c collapses create/modify into one upsert op —
    semantically identical under apply_changeset's drop+append)."""
    from ingest_ray.changeset import parse_o5c, parse_osm_change_xml

    def norm(changes):
        out = []
        for c in changes:
            e = dict(c["element"])
            op = "modify" if c["op"] in ("create", "modify") else "delete"
            if op == "delete":
                e = {"id": e["id"]}
            else:
                e.setdefault("tags", [])
                if "lon" in e:
                    e["lon"] = round(e["lon"], 7)
                    e["lat"] = round(e["lat"], 7)
                if "members" in e:
                    e["members"] = tuple(
                        tuple(sorted(m.items())) for m in e["members"]
                    )
                for k in ("refs", "tags"):
                    if k in e:
                        e[k] = tuple(tuple(x) if isinstance(x, list) else x for x in e[k])
            out.append((op, c["kind"], tuple(sorted(e.items()))))
        return out

    for i in range(4):
        with open(f"/root/reference/tests/data/0/changeset{i}.xml") as f:
            a = norm(parse_osm_change_xml(f.read()))
        with open(f"/root/reference/tests/data/0/changeset{i}.o5c", "rb") as f:
            b = norm(parse_o5c(f.read()))
        assert a == b, f"changeset{i} o5c parse diverges from XML"


@pytest.mark.usefixtures("ray_session")
def test_o5c_rounds_match_xml_rounds():
    """Driving the changeset engine from the o5c BINARIES produces the
    same final store as driving it from the XML fixtures."""
    import ray.data as rd

    from ingest_ray.changeset import parse_o5c, parse_osm_change_xml

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(
        __import__("ingest_ray.synth", fromlist=["golden_documents"]).golden_documents()
    )

    def run(rounds):
        current = _collect(ingest_features(docs, cfg))
        state = None
        for changes in rounds:
            delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
            delta_t = _collect(delta) if delta is not None else current.schema.empty_table()
            current = merge_features(current, delta_t, removed)
        return sorted((r["key"], bytes(r["payload"])) for r in current.to_pylist())

    xml_rounds, o5c_rounds = [], []
    for i in range(4):
        with open(f"/root/reference/tests/data/0/changeset{i}.xml") as f:
            xml_rounds.append(parse_osm_change_xml(f.read()))
        with open(f"/root/reference/tests/data/0/changeset{i}.o5c", "rb") as f:
            o5c_rounds.append(parse_o5c(f.read()))
    assert run(o5c_rounds) == run(xml_rounds)


@pytest.mark.usefixtures("ray_session")
def test_patch_tiles_augment_store(tmp_path):
    """patch_tiles(augment=...) on a store written with
    optimize_to_tiles(augment=add_cell_columns): the delta gains the
    derived H3/S2 columns before schema alignment, and the patched
    store byte-matches a fresh augment-mode optimize of the final
    corpus."""
    import os

    import ray.data as rd

    from ingest_ray.cells import add_cell_columns
    from ingest_ray.changeset import GOLDEN_ROUND1
    from ingest_ray.checkpoint import optimize_to_tiles, patch_tiles

    cfg = EngineConfig(join_mode="broadcast")
    docs = rd.from_arrow(golden_documents())
    store = str(tmp_path / "store")
    current = _collect(ingest_features(docs, cfg))
    optimize_to_tiles(
        rd.from_arrow(current), store, grid_divs=(4, 4), leaf_capacity=2,
        resume=False, augment=add_cell_columns,
    ).materialize()

    delta, removed, _state = apply_changeset(docs, CHANGES0, cfg)
    delta_t = _collect(delta) if delta is not None else current.schema.empty_table()
    current = merge_features(current, delta_t, removed)
    patch_tiles(store, delta_t, removed, leaf_capacity=2, augment=add_cell_columns)

    fresh = str(tmp_path / "fresh")
    optimize_to_tiles(
        rd.from_arrow(current), fresh, grid_divs=(4, 4), leaf_capacity=2,
        resume=False, augment=add_cell_columns,
    ).materialize()

    def tile_files(root):
        out = {}
        troot = os.path.join(root, "tiles")
        for dirpath, _dirs, names in os.walk(troot):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, troot)] = p
        return out

    sf_, ff = tile_files(store), tile_files(fresh)
    assert set(sf_) == set(ff) and len(sf_) > 0
    for rel in sf_:
        with open(sf_[rel], "rb") as a, open(ff[rel], "rb") as b:
            assert a.read() == b.read(), f"tile file {rel} bytes differ"
