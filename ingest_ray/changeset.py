"""Incremental changeset application — the reference's declared-but-
unimplemented o5c path (/root/reference/src/bin.rs:229-231
``unimplemented!``; semantics pinned by the commented golden rounds at
/root/reference/tests/ingest.rs:90-400): create / modify / delete of
nodes, ways and relations, with dependency propagation (a moved node
re-encodes every way using it; a changed way re-encodes every relation
holding it as a member).

Ray-Data-first design:

* the changeset is SMALL relative to the base corpus (the o5c model);
  its id sets broadcast via ``ray.put`` and every scan is a
  ``map_batches`` membership test — the base never shuffles;
* affected elements re-run the normal encode path against the UPDATED
  element tables (same joins layer, same indexes), so changeset output
  bytes are identical to a from-scratch ingest of the updated corpus —
  the invariant the golden test asserts;
* output is a (delta features, removed feature keys) pair so a tile
  store can be patched per partition: only tiles containing affected
  keys rewrite (see ``checkpoint.optimize_to_tiles`` resume notes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from . import features as F
from . import joins
from .config import EngineConfig
from .elements import NODES_SCHEMA, RELATIONS_SCHEMA, WAYS_SCHEMA

_KIND_NUM = {"node": 0, "way": 1, "relation": 2}


def parse_osm_change_xml(text: str) -> list[dict]:
    """osmChange XML → the ``changes`` list :func:`apply_changeset`
    consumes ({op, kind, element}).

    The reference's changeset fixtures are osmChange documents
    (/root/reference/tests/data/0/changeset{0-3}.xml; the o5c binaries
    are the same content). Delete entries may be bare ids; node/way/
    relation children follow OSM XML (<nd ref>, <member>, <tag k v>).
    """
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    changes: list[dict] = []
    for op_el in root:
        op = op_el.tag  # create | modify | delete
        if op not in ("create", "modify", "delete"):
            continue
        for el in op_el:
            kind = el.tag
            if kind not in _KIND_NUM:
                continue
            elem: dict = {"id": int(el.attrib["id"])}
            tags = [(t.attrib["k"], t.attrib["v"]) for t in el.findall("tag")]
            if tags or op != "delete":
                elem["tags"] = tags
            if kind == "node":
                if "lon" in el.attrib:
                    elem["lon"] = float(el.attrib["lon"])
                    elem["lat"] = float(el.attrib["lat"])
            elif kind == "way":
                elem["refs"] = [int(nd.attrib["ref"]) for nd in el.findall("nd")]
            else:
                elem["members"] = [
                    {
                        "mtype": m.attrib["type"],
                        "role": m.attrib.get("role", ""),
                        "ref": int(m.attrib["ref"]),
                    }
                    for m in el.findall("member")
                ]
            changes.append({"op": op, "kind": kind, "element": elem})
    return changes


class _O5Reader:
    """Cursor over o5m/o5c bytes: LEB128 uvarints, o5m signed varints
    (bit0 of the assembled value is the sign: ``-(u>>1)-1`` when set),
    and the 15000-entry rolling string table (most-recent-first
    references; only entries ≤250 bytes are stored)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos
        self.strings: list[bytes] = []

    def u(self) -> int:
        v = shift = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def s(self) -> int:
        v = self.u()
        return -(v >> 1) - 1 if v & 1 else v >> 1

    def _store(self, raw: bytes) -> None:
        if len(raw) <= 250:
            self.strings.append(raw)
            if len(self.strings) > 15_000:
                del self.strings[0]

    def string_pair(self) -> bytes:
        """One string-table entry: inline (ref 0, NUL-terminated raw
        bytes — one NUL for single strings, two for key\\0value\\0
        pairs, decided by the caller's split) or a back-reference."""
        ref = self.u()
        if ref:
            return self.strings[-ref]
        start = self.p
        nuls = 0
        while nuls < 2:
            if self.d[self.p] == 0:
                nuls += 1
            self.p += 1
        raw = self.d[start : self.p - 1]  # strip trailing NUL
        self._store(raw)
        return raw

    def single_string(self) -> bytes:
        ref = self.u()
        if ref:
            return self.strings[-ref]
        start = self.p
        while self.d[self.p] != 0:
            self.p += 1
        raw = self.d[start : self.p]
        self.p += 1
        self._store(raw)
        return raw


def parse_o5c(data: bytes) -> list[dict]:
    """o5c binary (the o5m change variant — the reference's fixture
    twins at /root/reference/tests/data/0/changeset{0-3}.o5c) → the
    same ``changes`` list as :func:`parse_osm_change_xml`.

    Public o5m framing: 0xFF reset (clears every delta counter and the
    string table), 0xE0 length-prefixed header ("o5c2"), 0x10/0x11/0x12
    length-prefixed node/way/relation records, 0xDB/0xDC skippable
    bbox/timestamp, 0xFE end. All ids, coords and refs are delta-coded
    against per-stream counters. o5c cannot distinguish create from
    modify — both surface as op "modify", which ``apply_changeset``
    treats as the same drop+append upsert; a record whose payload ends
    right after its version info is a delete (unit-tested byte-equal
    to the XML fixtures' parse, modulo that create/modify collapse).
    """
    r = _O5Reader(bytes(data))
    d = r.d
    n = len(d)
    # delta counters (one shared id stream; way refs and the three
    # relation member types each have their own reference stream)
    idc = 0
    lon = lat = 0
    wayref = 0
    memb = [0, 0, 0]
    ts = 0
    changes: list[dict] = []
    KINDS = ("node", "way", "relation")

    while r.p < n:
        t = d[r.p]
        r.p += 1
        if t == 0xFF:
            idc = lon = lat = ts = wayref = 0
            memb[:] = [0, 0, 0]
            r.strings.clear()
            continue
        if t == 0xFE:
            break
        ln = r.u()
        end = r.p + ln
        if t in (0xE0, 0xDB, 0xDC) or not 0x10 <= t <= 0x12:
            r.p = end
            continue
        kind_i = t - 0x10
        idc += r.s()
        version = r.u()
        if version:
            ts += r.s()
            if ts:
                r.s()  # changeset delta (unused)
                r.string_pair()  # uid+user author pair (unused)
        elem: dict = {"id": idc}
        if r.p >= end:  # o5c delete: id+version only
            changes.append({"op": "delete", "kind": KINDS[kind_i], "element": elem})
            continue
        if kind_i == 0:
            lon += r.s()
            lat += r.s()
            elem["lon"] = lon * 1e-7
            elem["lat"] = lat * 1e-7
        elif kind_i == 1:
            rl = r.u()  # read BEFORE taking r.p (left-to-right eval)
            ref_end = r.p + rl
            refs = []
            while r.p < ref_end:
                wayref += r.s()
                refs.append(wayref)
            elem["refs"] = refs
        else:
            rl = r.u()
            ref_end = r.p + rl
            members = []
            while r.p < ref_end:
                delta = r.s()
                tr = r.single_string()
                mtype = int(tr[:1])
                memb[mtype] += delta
                members.append(
                    {
                        "mtype": KINDS[mtype],
                        "role": tr[1:].decode("utf-8"),
                        "ref": memb[mtype],
                    }
                )
            elem["members"] = members
        tags = []
        while r.p < end:
            raw = r.string_pair()
            k, _, v = raw.partition(b"\x00")
            tags.append((k.decode("utf-8"), v.decode("utf-8")))
        elem["tags"] = tags
        changes.append({"op": "modify", "kind": KINDS[kind_i], "element": elem})
    return changes


def _ids_of(changes: list[dict], kind: str, ops: tuple[str, ...]) -> np.ndarray:
    out = [c["element"]["id"] for c in changes if c["kind"] == kind and c["op"] in ops]
    return np.array(sorted(set(out)), dtype=np.int64)


def _rows_of(changes: list[dict], kind: str, ops: tuple[str, ...]) -> list[dict]:
    return [c["element"] for c in changes if c["kind"] == kind and c["op"] in ops]


def _filter_out_ids(ds, drop_ids: np.ndarray):
    """Remove rows whose ``id`` is in the (broadcast) drop set."""
    if len(drop_ids) == 0:
        return ds
    ref = ray.put(np.sort(drop_ids))

    def fn(b: pa.Table) -> pa.Table:
        drop = ray.get(ref)
        ids = b.column("id").to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, drop)
        return b.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _element_rows_to_table(rows: list[dict], kind: str) -> pa.Table:
    schema = {"node": NODES_SCHEMA, "way": WAYS_SCHEMA, "relation": RELATIONS_SCHEMA}[kind]
    if not rows:
        return schema.empty_table()
    conv = []
    for r in rows:
        row = {
            "id": r["id"],
            "tags": [{"key": k, "value": v} for k, v in r.get("tags", [])],
            "doc_id": r.get("doc_id", "changeset"),
            "span_idx": r.get("span_idx", -1),
        }
        if kind == "node":
            row["lon"] = r["lon"]
            row["lat"] = r["lat"]
        elif kind == "way":
            row["refs"] = r.get("refs", [])
        else:
            row["members"] = r.get("members", [])
        conv.append(row)
    return pa.Table.from_pylist(conv, schema=schema)


def _scan_ids_with_member(ds, list_col: str, target_ids: np.ndarray, member_field: str | None = None) -> np.ndarray:
    """ids of rows whose ``list_col`` intersects ``target_ids``
    (broadcast membership scan; base never shuffles)."""
    if len(target_ids) == 0:
        return np.empty(0, dtype=np.int64)
    ref = ray.put(np.sort(target_ids))

    def fn(b: pa.Table) -> pa.Table:
        targets = ray.get(ref)
        col = b.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False)
        off = off - off[0]
        flat = col.flatten()
        vals = (
            flat.field(member_field) if member_field else flat
        ).to_numpy(zero_copy_only=False)
        hit_flat = np.isin(vals, targets)
        counts = np.diff(off)
        parent = np.repeat(np.arange(len(b)), counts)
        hit_rows = np.unique(parent[hit_flat])
        ids = b.column("id").to_numpy(zero_copy_only=False)[hit_rows]
        return pa.table({"id": pa.array(ids, pa.int64())})

    parts = list(
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    )
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(pa.concat_tables(parts).column("id").to_numpy(zero_copy_only=False))


def apply_changeset(
    documents_ds,
    changes: list[dict],
    config: EngineConfig | None = None,
    element_tables: dict | None = None,
):
    """Apply a changeset to a document corpus → (delta features Dataset,
    removed feature keys ndarray, updated element datasets).

    ``changes``: list of {op: create|modify|delete, kind: node|way|
    relation, element: parsed-element dict (spans.parse_geo_span
    format)}. The delta features are byte-identical to what a fresh
    ingest of the updated corpus would produce for the affected
    elements; ``removed`` lists every feature key whose old version
    must leave the store (deleted AND re-encoded elements).

    ``element_tables`` (the ``upd`` dict of a previous call) chains
    successive changesets without re-parsing documents — the
    reference's multi-round o5c replication loop
    (/root/reference/tests/ingest.rs:90-400, rounds 0-3).
    """
    cfg = config or EngineConfig()
    if element_tables is not None:
        base_nodes = element_tables["node"]
        base_ways = element_tables["way"]
        base_rels = element_tables["relation"]
    else:
        from .elements import elements_all_dataset, kind_view

        all_el = elements_all_dataset(documents_ds).materialize()
        base_nodes = kind_view(all_el, "node")
        base_ways = kind_view(all_el, "way")
        base_rels = kind_view(all_el, "relation")

    # 1. updated element tables: drop modify+delete ids, append create+modify rows
    upd = {}
    extra = {}
    for kind, base in (("node", base_nodes), ("way", base_ways), ("relation", base_rels)):
        drop = _ids_of(changes, kind, ("modify", "delete"))
        add_rows = _rows_of(changes, kind, ("create", "modify"))
        extra[kind] = _element_rows_to_table(add_rows, kind)
        filtered = _filter_out_ids(base, drop)
        if len(extra[kind]):
            import ray.data as rd

            filtered = filtered.union(rd.from_arrow(extra[kind]))
        upd[kind] = filtered.materialize()

    # 2. dependency propagation (broadcast membership scans)
    changed_nodes = _ids_of(changes, "node", ("create", "modify", "delete"))
    changed_ways = _ids_of(changes, "way", ("create", "modify", "delete"))
    changed_rels = _ids_of(changes, "relation", ("create", "modify", "delete"))
    ways_dep = _scan_ids_with_member(upd["way"], "refs", changed_nodes)
    ways_aff = np.unique(np.concatenate([ways_dep, changed_ways]))
    rels_dep = _scan_ids_with_member(upd["relation"], "members", ways_aff, member_field="ref")
    # relations also re-resolve when member-way NODES moved (two-hop)
    rels_aff = np.unique(np.concatenate([rels_dep, changed_rels]))

    # 3. re-encode the affected subset against the UPDATED tables
    node_idx_ref = joins.build_node_index_auto(upd["node"])
    way_idx_ref = joins.build_way_refs_index_auto(upd["way"])

    def subset(ds, ids):
        if len(ids) == 0:
            return None
        ref = ray.put(np.sort(ids))

        def fn(b: pa.Table) -> pa.Table:
            want = ray.get(ref)
            keep = np.isin(b.column("id").to_numpy(zero_copy_only=False), want)
            return b.filter(pa.array(keep))

        return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    deltas = []
    aff_nodes = subset(upd["node"], changed_nodes)
    if aff_nodes is not None:
        deltas.append(
            aff_nodes.map_batches(F.encode_nodes_batch, batch_format="pyarrow", zero_copy_batch=True)
        )
    aff_ways = subset(upd["way"], ways_aff)
    if aff_ways is not None:
        prepared = aff_ways.map_batches(F.prepare_ways_batch, batch_format="pyarrow", zero_copy_batch=True)

        def res_w(b: pa.Table) -> pa.Table:
            return F.encode_ways_batch(joins.resolve_ways_batch(b, ray.get(node_idx_ref)))

        deltas.append(prepared.map_batches(res_w, batch_format="pyarrow", zero_copy_batch=True))
    aff_rels = subset(upd["relation"], rels_aff)
    if aff_rels is not None:
        prepared_r = aff_rels.map_batches(
            F.prepare_relations_batch, batch_format="pyarrow", zero_copy_batch=True
        )

        def res_r(b: pa.Table) -> pa.Table:
            return F.encode_relations_batch(
                joins.resolve_relations_batch(b, ray.get(way_idx_ref), ray.get(node_idx_ref))
            )

        deltas.append(prepared_r.map_batches(res_r, batch_format="pyarrow", zero_copy_batch=True))

    delta = None
    for d in deltas:
        delta = d if delta is None else delta.union(d)

    # 4. stale feature keys: every affected or deleted element's old key
    removed = np.concatenate(
        [
            changed_nodes.astype(np.uint64) * 3 + 0,
            ways_aff.astype(np.uint64) * 3 + 1,
            rels_aff.astype(np.uint64) * 3 + 2,
        ]
    )
    return delta, removed, upd


def merge_features(old_features: pa.Table, delta: pa.Table, removed_keys: np.ndarray) -> pa.Table:
    """Patch helper: old features − removed keys + delta (small-side
    table form). For a COMMITTED tile store use
    ``checkpoint.patch_tiles`` — it applies the same mask per affected
    grid cell and rewrites only those cells."""
    keys = old_features.column("key").to_numpy(zero_copy_only=False)
    keep = ~np.isin(keys.astype(np.uint64), removed_keys.astype(np.uint64))
    kept = old_features.filter(pa.array(keep))
    if len(delta) == 0:
        return kept
    return pa.concat_tables([kept, delta.cast(old_features.schema)])

# --------------------------------------------------------------------------
# The reference's pinned changeset rounds 1-3
# (/root/reference/tests/data/0/changeset{1,2,3}.xml; spec commented at
# tests/ingest.rs:150-400) in parsed-element form. Round 0 lives with
# the golden test (tests/test_changeset.py CHANGES0).
# --------------------------------------------------------------------------

GOLDEN_ROUND1 = [
    {"op": "create", "kind": "node", "element": {"id": 9100, "lon": 5.004, "lat": -10.006, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 9101, "lon": 5.005, "lat": -10.006, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 9102, "lon": 5.005, "lat": -10.007, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 9103, "lon": 5.004, "lat": -10.007, "tags": []}},
    {"op": "create", "kind": "way", "element": {"id": 602, "refs": [9100, 9101, 9102, 9103, 9100], "tags": [("place", "island")]}},
    {
        "op": "modify",
        "kind": "relation",
        "element": {
            "id": 700,
            "members": [
                {"mtype": "way", "role": "outer", "ref": 600},
                {"mtype": "way", "role": "inner", "ref": 601},
                {"mtype": "way", "role": "inner", "ref": 602},
            ],
            "tags": [("type", "multipolygon"), ("natural", "water"), ("name", "Cool Lake")],
        },
    },
]

GOLDEN_ROUND2 = [
    {"op": "delete", "kind": "node", "element": {"id": 9103}},
    {"op": "create", "kind": "node", "element": {"id": 9104, "lon": 5.003, "lat": -10.008, "tags": [("amenity", "boat_rental")]}},
    {"op": "modify", "kind": "way", "element": {"id": 602, "refs": [9100, 9101, 9102, 9104, 9100], "tags": [("place", "island")]}},
]

GOLDEN_ROUND3 = [
    {"op": "create", "kind": "node", "element": {"id": 3001, "lon": 7.000, "lat": 15.000, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3002, "lon": 7.010, "lat": 15.010, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3003, "lon": 7.000, "lat": 15.020, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3011, "lon": 7.002, "lat": 15.002, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3012, "lon": 7.008, "lat": 15.010, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3013, "lon": 7.002, "lat": 15.018, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3021, "lon": 6.998, "lat": 14.998, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3022, "lon": 7.012, "lat": 15.010, "tags": []}},
    {"op": "create", "kind": "node", "element": {"id": 3023, "lon": 6.998, "lat": 15.022, "tags": []}},
    {"op": "create", "kind": "way", "element": {"id": 4000, "refs": [3001, 3002], "tags": []}},
    {"op": "create", "kind": "way", "element": {"id": 4001, "refs": [3003, 3001], "tags": []}},
    {"op": "create", "kind": "way", "element": {"id": 4002, "refs": [3011, 3012, 3013, 3011], "tags": []}},
    {"op": "create", "kind": "way", "element": {"id": 4003, "refs": [3021, 3022, 3023], "tags": [("historic", "castle_wall")]}},
    {
        "op": "create",
        "kind": "relation",
        "element": {
            "id": 4004,
            "members": [
                {"mtype": "way", "role": "outer", "ref": 4000},
                {"mtype": "way", "role": "outer", "ref": 4001},
                {"mtype": "way", "role": "inner", "ref": 4002},
            ],
            "tags": [("type", "multipolygon"), ("historic", "castle")],
        },
    },
]
