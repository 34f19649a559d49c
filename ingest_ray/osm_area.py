"""is_area classification — behavior of the ``osm_is_area`` crate as
used by the reference (/root/reference/src/lib.rs:236-237 for ways,
:325-326 for relations), pinned by the golden corpus:

* closed tagged way 555 (leisure=park) → Area
  (/root/reference/tests/ingest.rs:57-63);
* open way (historic=castle_wall) → Line
  (/root/reference/tests/ingest.rs:378-383 in the changeset spec);
* relation must be an area (type=multipolygon/boundary) or it is
  dropped entirely (/root/reference/src/lib.rs:325-326).

Rule table is a curated public-OSM heuristic: a closed ring (first ref
== last ref, ≥4 refs) is an area when ``area=yes`` or any present key
implies area-ness (with per-key exceptions), and never when
``area=no``.
"""

from __future__ import annotations

# key → (mode, values). mode "all": any value implies area, except listed.
# mode "only": just the listed values imply area.
_AREA_RULES: dict[str, tuple[str, frozenset[str]]] = {
    "building": ("all", frozenset()),
    "landuse": ("all", frozenset()),
    "leisure": ("all", frozenset({"slipway", "track"})),
    "natural": ("all", frozenset({"coastline", "cliff", "ridge", "arete", "tree_row"})),
    "amenity": ("all", frozenset()),
    "place": ("all", frozenset()),
    "shop": ("all", frozenset()),
    "tourism": ("all", frozenset()),
    "historic": ("all", frozenset()),
    "boundary": ("all", frozenset()),
    "office": ("all", frozenset()),
    "military": ("all", frozenset()),
    "craft": ("all", frozenset()),
    "sport": ("all", frozenset()),
    "public_transport": ("only", frozenset({"platform", "station"})),
    "aeroway": ("all", frozenset({"taxiway", "runway"})),
    "waterway": ("only", frozenset({"riverbank", "dock", "boatyard", "dam"})),
    "highway": ("only", frozenset({"services", "rest_area", "escape", "platform"})),
    "railway": ("only", frozenset({"station", "turntable", "roundhouse", "platform"})),
    "man_made": ("all", frozenset({"cutline", "embankment", "pipeline"})),
    "power": ("only", frozenset({"plant", "substation", "generator", "transformer"})),
}

_AREA_RELATION_TYPES = frozenset({"multipolygon", "boundary"})


def way_is_area(tags: list[tuple[str, str]], refs: list[int]) -> bool:
    """osm_is_area::way analog (called at /root/reference/src/lib.rs:237)."""
    if len(refs) < 4 or refs[0] != refs[-1]:
        return False
    tag_map = dict(tags)
    area = tag_map.get("area")
    if area == "no":
        return False
    if area == "yes":
        return True
    for k, v in tags:
        rule = _AREA_RULES.get(k)
        if rule is None:
            continue
        mode, values = rule
        if mode == "all" and v not in values:
            return True
        if mode == "only" and v in values:
            return True
    return False


def ways_are_area_vec(tags_col, ref_offsets, ref_flat) -> "np.ndarray":
    """Vectorized :func:`way_is_area` over a batch (identical rule
    semantics, property-tested against the scalar form).

    ``tags_col`` is the Arrow list<struct<key,value>> column;
    ``ref_offsets``/``ref_flat`` the refs list layout. Only closed rings
    (≥4 refs, first == last) evaluate the tag rules, via pyarrow.compute
    string kernels over the flattened tag pairs — no per-way Python.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(ref_offsets) - 1
    counts = np.diff(ref_offsets)
    closed = np.zeros(n, dtype=bool)
    m = counts >= 4
    closed[m] = ref_flat[ref_offsets[:-1][m]] == ref_flat[(ref_offsets[1:] - 1)[m]]
    out = np.zeros(n, dtype=bool)
    rows = np.flatnonzero(closed)
    if len(rows) == 0:
        return out
    sub = tags_col.take(pa.array(rows, pa.int64()))
    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    toff = sub.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    toff = toff - toff[0]
    flat = sub.flatten()
    keys = flat.field("key")
    vals = flat.field("value")
    trow = np.repeat(np.arange(len(rows)), np.diff(toff))

    # area=yes / area=no override — LAST occurrence wins (dict(tags))
    akey = np.asarray(
        pc.equal(keys, "area").fill_null(False).to_numpy(zero_copy_only=False), dtype=bool
    )
    area_yes = np.zeros(len(rows), dtype=bool)
    area_no = np.zeros(len(rows), dtype=bool)
    aidx = np.flatnonzero(akey)
    if len(aidx):
        last_area = np.full(len(rows), -1, dtype=np.int64)
        last_area[trow[aidx]] = aidx  # ascending scatter → last wins
        has = np.flatnonzero(last_area >= 0)
        av = vals.take(pa.array(last_area[has], pa.int64())).to_numpy(zero_copy_only=False)
        area_yes[has] = av == "yes"
        area_no[has] = av == "no"

    hit = np.zeros(len(flat), dtype=bool)
    for k, (mode, values) in _AREA_RULES.items():
        km = np.asarray(
            pc.equal(keys, k).fill_null(False).to_numpy(zero_copy_only=False), dtype=bool
        )
        if not km.any():
            continue
        if values:
            vm = np.asarray(
                pc.is_in(vals, value_set=pa.array(sorted(values)))
                .fill_null(False)
                .to_numpy(zero_copy_only=False),
                dtype=bool,
            )
            hit |= km & (~vm if mode == "all" else vm)
        elif mode == "all":
            hit |= km
    row_hit = np.bincount(trow[hit], minlength=len(rows)) > 0
    out[rows] = ~area_no & (area_yes | row_hit)
    return out


def relations_are_area_vec(tags_col) -> "np.ndarray":
    """Vectorized :func:`relation_is_area` over an Arrow tags column."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(tags_col, pa.ChunkedArray):
        tags_col = tags_col.combine_chunks()
    n = len(tags_col)
    toff = tags_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    toff = toff - toff[0]
    flat = tags_col.flatten()
    if len(flat) == 0:
        return np.zeros(n, dtype=bool)
    trow = np.repeat(np.arange(n), np.diff(toff))
    hit = pc.and_(
        pc.equal(flat.field("key"), "type"),
        pc.is_in(flat.field("value"), value_set=pa.array(sorted(_AREA_RELATION_TYPES))),
    )
    hit = np.asarray(hit.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)
    return np.bincount(trow[hit], minlength=n) > 0


def relation_is_area(tags: list[tuple[str, str]]) -> bool:
    """osm_is_area::relation analog (/root/reference/src/lib.rs:325);
    non-area relations are dropped entirely (:326)."""
    for k, v in tags:
        if k == "type" and v in _AREA_RELATION_TYPES:
            return True
    return False
