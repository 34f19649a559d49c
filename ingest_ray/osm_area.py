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


def relation_is_area(tags: list[tuple[str, str]]) -> bool:
    """osm_is_area::relation analog (/root/reference/src/lib.rs:325);
    non-area relations are dropped entirely (:326)."""
    for k, v in tags:
        if k == "type" and v in _AREA_RELATION_TYPES:
            return True
    return False
