"""Deterministic corpus synthesis (FIXTURES.md §1, §3, §6).

Everything is seeded / hash-derived — no wall clock, no ``random``
module state — so every process (tests, bench at two parallelism
levels, the grading driver) sees identical bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .spans import DOCUMENTS_SCHEMA, serialize_node, serialize_relation, serialize_way
from .util import splitmix64

# --------------------------------------------------------------------------
# Golden corpus 0 — the reference's end-to-end fixture
# (/root/reference/tests/data/0/ingest.xml via FIXTURES.md §3)
# --------------------------------------------------------------------------

GOLDEN_NODES = [
    (1312, 13.02, 37.00, [("amenity", "cafe")]),
    (1313, 13.00, 37.00, []),
    (1314, 13.01, 37.01, []),
    (1315, 13.02, 37.00, []),
    (2000, 13.03, 37.03, [("amenity", "bus_station")]),
    (9000, 5.000, -10.000, []),
    (9001, 5.000, -10.010, []),
    (9002, 5.010, -10.010, []),
    (9003, 5.010, -10.000, []),
    (9004, 5.005, -10.003, []),
    (9005, 5.006, -10.004, []),
    (9006, 5.007, -10.003, []),
]

GOLDEN_WAYS = [
    (555, [1313, 1314, 1315, 1313], [("leisure", "park"), ("name", "triangle park")]),
    (600, [9000, 9001, 9002, 9003, 9000], []),
    (601, [9004, 9005, 9006, 9004], []),
]

GOLDEN_RELATIONS = [
    (
        700,
        [("way", "outer", 600), ("way", "inner", 601)],
        [("type", "multipolygon"), ("natural", "water"), ("name", "cool lake")],
    ),
]


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _wrap_documents(geo_spans: list[tuple[str, str]], spans_per_doc: int = 4) -> pa.Table:
    """Wrap serialized geo spans into interleaved documents.

    Interleaving rule (FIXTURES.md §1.1): text / media filler spans are
    woven in round-robin, position decided by ``hash(doc_id) % 3`` —
    the pipeline must carry them through untouched.

    Vectorized construction (array scatter instead of 30M span dicts —
    the dict form GC-thrashed on large corpora); output is byte-equal
    to the original per-row builder (tested). Built in doc-aligned
    slices: a single pa.array over >2GB of strings chunks, which
    StructArray.from_arrays rejects.
    """
    if isinstance(geo_spans, tuple):
        kinds, texts = geo_spans  # pre-built arrays (vectorized caller)
    else:
        kinds = np.array([k for k, _t in geo_spans], dtype=object)
        texts = np.array([t for _k, t in geo_spans], dtype=object)
    n = len(kinds)
    if n == 0:
        return DOCUMENTS_SCHEMA.empty_table()
    SLICE = 4_000_000 // spans_per_doc * spans_per_doc
    if n > SLICE:
        parts = [
            _wrap_chunk(kinds[lo : lo + SLICE], texts[lo : lo + SLICE], lo, spans_per_doc)
            for lo in range(0, n, SLICE)
        ]
        # stay chunked: combining >2GB of string data overflows the
        # int32 offsets of pa.string()
        return pa.concat_tables(parts)
    return _wrap_chunk(kinds, texts, 0, spans_per_doc)


def _wrap_chunk(kinds: np.ndarray, texts: np.ndarray, g0: int, spans_per_doc: int) -> pa.Table:
    """One doc-aligned slice of :func:`_wrap_documents` (``g0`` = global
    index of the slice's first geo span; must be a multiple of
    ``spans_per_doc``)."""
    n = len(kinds)
    g = np.arange(g0, g0 + n, dtype=np.int64)
    doc_idx_g = g // spans_per_doc  # global doc number (hash + id source)
    doc_lo = g0 // spans_per_doc
    doc_idx = doc_idx_g - doc_lo  # slice-local doc index
    j = g % spans_per_doc
    n_docs = int(doc_idx[-1]) + 1
    h_doc = (splitmix64(doc_idx_g.astype(np.uint64)) % np.uint64(3)).astype(np.int64)
    has_filler = (j % 3) == h_doc
    has_media = (g % 7) == 6

    counts = 1 + has_filler.astype(np.int64) + has_media.astype(np.int64)
    pos = np.cumsum(counts) - counts  # first output slot of each geo span
    total = int(counts.sum())

    geo_texts = texts
    glen = np.fromiter((len(t) for t in geo_texts), dtype=np.int64, count=n)
    flen = np.where(has_filler, 18 + np.char.str_len(g.astype("U20")), 0)
    # per-doc running character offset before each geo span
    adv = flen + glen
    cum = np.cumsum(adv) - adv
    doc_start = cum[np.searchsorted(doc_idx, np.arange(n_docs))]
    pre = cum - doc_start[doc_idx]  # doc-local char offset before each geo span

    out_kind = np.empty(total, dtype=object)
    out_text = np.empty(total, dtype=object)
    out_media = np.empty(total, dtype=object)
    out_off = np.zeros(total, dtype=np.int64)
    out_media[:] = ""

    f_pos = pos[has_filler]
    out_kind[f_pos] = "text"
    out_text[f_pos] = [f"interleaved text #{int(i)}" for i in g[has_filler]]
    out_off[f_pos] = pre[has_filler]

    m_pos = (pos + has_filler)[has_media]
    out_kind[m_pos] = "media"
    out_text[m_pos] = ""
    out_media[m_pos] = [
        f"media://{int(v):016x}" for v in splitmix64(g[has_media].astype(np.uint64))
    ]
    out_off[m_pos] = (pre + flen)[has_media]

    g_pos = pos + has_filler + has_media
    out_kind[g_pos] = kinds
    out_text[g_pos] = geo_texts
    out_off[g_pos] = pre + flen

    struct = pa.StructArray.from_arrays(
        [
            pa.array(out_kind, pa.string()),
            pa.array(out_text, pa.string()),
            pa.array(out_media, pa.string()),
            pa.array(out_off, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    doc_counts = np.bincount(doc_idx, weights=counts, minlength=n_docs).astype(np.int64)
    doc_offsets = np.concatenate([[0], np.cumsum(doc_counts)]).astype(np.int32)
    spans_list = pa.ListArray.from_arrays(pa.array(doc_offsets, pa.int32()), struct)
    doc_ids = pa.array([f"doc-{i:06d}" for i in range(doc_lo, doc_lo + n_docs)], pa.string())
    return pa.table({"doc_id": doc_ids, "spans": spans_list}).cast(DOCUMENTS_SCHEMA)


def golden_documents() -> pa.Table:
    """Golden corpus 0 as an interleaved documents table."""
    geo: list[tuple[str, str]] = []
    for nid, lon, lat, tags in GOLDEN_NODES:
        geo.append(("node", serialize_node(nid, lon, lat, tags)))
    for wid, refs, tags in GOLDEN_WAYS:
        geo.append(("way", serialize_way(wid, refs, tags)))
    for rid, members, tags in GOLDEN_RELATIONS:
        geo.append(("relation", serialize_relation(rid, members, tags)))
    return _wrap_documents(geo, spans_per_doc=4)


# --------------------------------------------------------------------------
# Scale-up generator (FIXTURES.md §6): jittered grid + hotspot skew
# --------------------------------------------------------------------------


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_elements(n: int, seed: int = 42, hotspot_frac: float = 0.2, _docs_form: bool = False):
    """n elements → (nodes, ways, relations) numpy-backed dicts.

    Nodes on a jittered grid over [-180,180]×[-90,90]; ``hotspot_frac``
    of them inside a 1°×1° "city" box (tile skew, SURVEY.md §7.5).
    Every 5th element index becomes a way (closed 4-12-gon over recent
    node ids, 10% tagged leisure=park); every 50th a relation
    (outer+inner pair, type=multipolygon).
    """
    idx = np.arange(n, dtype=np.uint64)
    # wrap-around multiply in Python ints (np scalar uint64 * would
    # RuntimeWarning on the intentional overflow)
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    h1 = splitmix64(idx + salt)
    h2 = splitmix64(h1)
    h3 = splitmix64(h2)

    lon = _u01(h1) * 360.0 - 180.0
    lat = _u01(h2) * 180.0 - 90.0
    hot = _u01(h3) < hotspot_frac
    lon = np.where(hot, 139.0 + _u01(h2), lon)  # "city" box
    lat = np.where(hot, 35.0 + _u01(h1), lat)

    node_ids = (idx + np.uint64(1)).astype(np.int64) * 10
    tagged = (h3 % np.uint64(10)) == 0
    nodes = {
        "id": node_ids,
        "lon": np.round(lon, 6),
        "lat": np.round(lat, 6),
        "tagged": tagged,
    }

    ways = []
    way_id_base = 10_000_000_000
    lon_r = nodes["lon"]
    lat_r = nodes["lat"]
    # order each ring's vertices by angle around their centroid so the
    # polygon is SIMPLE — real OSM areas (buildings, parks, lakes) are
    # simple polygons; random vertex order yields star-crossed
    # self-intersecting rings that drive every triangulation into
    # earcut's worst-case split fallback (not a representative
    # workload). Ring construction is one global lexsort over all ways
    # (the per-way loop dominated corpus generation at 60M elements).
    way_el = np.arange(4, n, 5, dtype=np.int64)
    kk = 4 + (h1[way_el] % np.uint64(9)).astype(np.int64)
    lo = np.maximum(0, way_el - kk)
    L = way_el - lo
    m = L >= 3
    way_el, lo, L = way_el[m], lo[m], L[m]
    offs = np.concatenate([[0], np.cumsum(L)])
    total = int(offs[-1])
    way_of = np.repeat(np.arange(len(way_el)), L)
    flat_idx = np.repeat(lo, L) + (np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], L))
    vx = lon_r[flat_idx]
    vy = lat_r[flat_idx]
    starts = offs[:-1]
    mx = np.add.reduceat(vx, starts) / L
    my = np.add.reduceat(vy, starts) / L
    ang = np.arctan2(vy - my[way_of], vx - mx[way_of])
    order = np.lexsort((ang, way_of))
    ring_flat = node_ids[flat_idx[order]]
    park = (h2[way_el] % np.uint64(10)) == 0
    way_ids_arr = way_id_base + way_el

    relations = []
    rel_id_base = 20_000_000_000
    for i in range(0, len(way_ids_arr) - 1, 10):
        outer, inner = int(way_ids_arr[i]), int(way_ids_arr[i + 1])
        relations.append(
            (
                rel_id_base + i,
                [("way", "outer", outer), ("way", "inner", inner)],
                [("type", "multipolygon"), ("natural", "water"), ("name", f"lake {i}")],
            )
        )

    if _docs_form:
        # vectorized ways struct for Arrow-side serialization: flat ring
        # ids WITH the closing duplicate, one scatter (no per-way loop)
        offs2 = np.concatenate([[0], np.cumsum(L + 1)])
        flat2 = np.empty(int(offs2[-1]), dtype=np.int64)
        flat2[np.arange(total, dtype=np.int64) + way_of] = ring_flat
        flat2[offs2[1:] - 1] = ring_flat[offs[:-1]]
        ways_v = {
            "id": way_ids_arr,
            "el": way_el,
            "park": park,
            "ring_flat": flat2,
            "offs": offs2,
        }
        return nodes, ways_v, relations

    for w in range(len(way_el)):
        i = int(way_el[w])
        ring = ring_flat[offs[w] : offs[w + 1]].tolist()
        ring.append(ring[0])
        tags = [("leisure", "park"), ("name", f"park {i}")] if park[w] else []
        ways.append((way_id_base + i, ring, tags))
    return nodes, ways, relations


def synth_documents(n: int, seed: int = 42, hotspot_frac: float = 0.2, spans_per_doc: int = 4) -> pa.Table:
    """Seeded synthetic corpus as an interleaved documents table.

    Element line serialization is Arrow-vectorized (cast + string join
    kernels) — the per-element f-string loop dominated corpus
    generation beyond ~30M elements. Number formatting uses Arrow's
    shortest round-trip cast, so parsed element VALUES are identical to
    the scalar serializers (pinned by test); byte formats may differ
    ('0' vs '0.0'), which only versioned corpus caches care about.
    """
    import pyarrow.compute as pc

    nodes, ways, relations = synth_elements(n, seed, hotspot_frac, _docs_form=True)
    n_nodes = len(nodes["id"])

    def cat(*parts):
        return pc.binary_join_element_wise(*parts, "")

    SLICE = 8_000_000  # a single Arrow string array caps at 2GB; slice

    def node_texts(a: int, b: int) -> np.ndarray:
        ids_s = pc.cast(pa.array(nodes["id"][a:b]), pa.string())
        lon_s = pc.cast(pa.array(nodes["lon"][a:b]), pa.string())
        lat_s = pc.cast(pa.array(nodes["lat"][a:b]), pa.string())
        idx_s = pc.cast(pa.array(np.arange(a, b, dtype=np.int64)), pa.string())
        tags_s = pc.if_else(
            pa.array(nodes["tagged"][a:b]),
            cat("amenity=cafe;name=node ", idx_s),
            pa.scalar(""),
        )
        out = cat("node|id=", ids_s, "|lon=", lon_s, "|lat=", lat_s, "|tags=", tags_s)
        return out.to_numpy(zero_copy_only=False)

    wv = ways  # vectorized ways struct (see synth_elements _docs_form)

    def way_texts(a: int, b: int) -> np.ndarray:
        wid_s = pc.cast(pa.array(wv["id"][a:b]), pa.string())
        lo_, hi_ = int(wv["offs"][a]), int(wv["offs"][b])
        flat_s = pc.cast(pa.array(wv["ring_flat"][lo_:hi_]), pa.string())
        offs = (wv["offs"][a : b + 1] - lo_).astype(np.int32)
        refs_join = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat_s), ","
        )
        el_s = pc.cast(pa.array(wv["el"][a:b]), pa.string())
        tags_s = pc.if_else(
            pa.array(wv["park"][a:b]), cat("leisure=park;name=park ", el_s), pa.scalar("")
        )
        out = cat("way|id=", wid_s, "|refs=", refs_join, "|tags=", tags_s)
        return out.to_numpy(zero_copy_only=False)

    rel_txt = [serialize_relation(rid, members, tags) for rid, members, tags in relations]

    n_ways = len(wv["id"])
    kinds = np.empty(n_nodes + n_ways + len(rel_txt), dtype=object)
    texts = np.empty(len(kinds), dtype=object)
    kinds[:n_nodes] = "node"
    for a in range(0, n_nodes, SLICE):
        b = min(a + SLICE, n_nodes)
        texts[a:b] = node_texts(a, b)
    kinds[n_nodes : n_nodes + n_ways] = "way"
    for a in range(0, n_ways, SLICE):
        b = min(a + SLICE, n_ways)
        texts[n_nodes + a : n_nodes + b] = way_texts(a, b)
    kinds[n_nodes + n_ways :] = "relation"
    texts[n_nodes + n_ways :] = rel_txt
    return _wrap_documents((kinds, texts), spans_per_doc=spans_per_doc)


def write_corpus(
    path: str,
    n: int,
    seed: int = 42,
    hotspot_frac: float = 0.2,
    row_group_size: int = 8192,
    num_files: int = 1,
) -> str:
    """Write a synthetic corpus parquet (idempotent on same args).

    ``num_files > 1`` writes a directory of part files — one read task
    per file in Ray Data, so the read parallelizes (a single parquet
    file is ONE fragment = a serial read, which caps the whole
    pipeline's scaling)."""
    import os

    if num_files > 1 and os.path.isdir(path):
        return path  # already complete (directories appear only via rename below)
    tbl = synth_documents(n, seed, hotspot_frac)
    if num_files <= 1:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
        return path
    # write into a temp dir and rename: a concurrent reader gating on
    # isdir(path) (bench --scaling / the campaign runner) must never see
    # a partially-written corpus
    tmp_dir = path + ".tmp"
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    rows = len(tbl)
    per = -(-rows // num_files)
    for i in range(num_files):
        part = tbl.slice(i * per, per)
        if len(part) == 0:
            break
        pq.write_table(part, os.path.join(tmp_dir, f"part-{i:05d}.parquet"), row_group_size=row_group_size)
    os.rename(tmp_dir, path)
    return path
