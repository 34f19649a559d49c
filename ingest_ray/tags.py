"""Tag → feature-type classification and label packing.

Mirrors the *behavior* of the reference's tag stage (reference:
/root/reference/src/lib.rs:144-148,216-221,320-324 — georender_pack
``tags::parse`` + the ``place.other`` drop filter) without porting it:

* a static dictionary maps ``"key.value"`` → integer feature type;
* unknown values of a known key fall back to ``"key.other"``;
* elements that classify as the catch-all ``place.other`` are dropped
  as standalone features (but stay join-able as way vertices);
* ``name`` tags are packed into the georender label byte format:
  ``varint(len) + b"=" + name`` entries terminated by ``0x00``
  (empty labels == ``b"\\x00"``; pinned by the reference golden test
  /root/reference/tests/ingest.rs:62,72,78 — ``\\x0e=triangle park\\x00``).

The dictionary itself is built here deterministically from a curated
public-OSM tag table (sorted, stable ids). The reference's exact ids
come from an external crate data file we do not copy; what the golden
tests pin is *stability* and the catch-all semantics, which hold here.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# Keys whose presence (with any curated value) defines a feature class.
_FEATURE_KEYS = {
    "aerialway": ["cable_car", "chair_lift", "gondola", "station", "other"],
    "aeroway": ["aerodrome", "apron", "gate", "helipad", "runway", "taxiway", "terminal", "other"],
    "amenity": [
        "atm", "bank", "bar", "bench", "bicycle_parking", "bus_station", "cafe", "car_wash",
        "cinema", "clinic", "college", "drinking_water", "fast_food", "fire_station",
        "fountain", "fuel", "grave_yard", "hospital", "kindergarten", "library",
        "marketplace", "parking", "pharmacy", "place_of_worship", "police", "post_box",
        "post_office", "pub", "recycling", "restaurant", "school", "shelter", "swimming_pool",
        "taxi", "theatre", "toilets", "townhall", "university", "waste_basket", "other",
    ],
    "barrier": ["fence", "gate", "hedge", "wall", "other"],
    "boundary": ["administrative", "national_park", "protected_area", "other"],
    "building": [
        "apartments", "church", "commercial", "detached", "garage", "house", "hut",
        "industrial", "residential", "retail", "school", "shed", "warehouse", "yes", "other",
    ],
    "craft": ["brewery", "carpenter", "electrician", "other"],
    "emergency": ["fire_hydrant", "phone", "other"],
    "highway": [
        "bridleway", "bus_stop", "construction", "crossing", "cycleway", "footway",
        "living_street", "motorway", "motorway_link", "path", "pedestrian", "primary",
        "primary_link", "residential", "road", "secondary", "secondary_link", "service",
        "steps", "street_lamp", "tertiary", "tertiary_link", "track", "traffic_signals",
        "trunk", "trunk_link", "turning_circle", "unclassified", "other",
    ],
    "historic": [
        "archaeological_site", "castle", "castle_wall", "citywalls", "fort", "memorial",
        "monument", "ruins", "wayside_cross", "other",
    ],
    "landuse": [
        "allotments", "basin", "brownfield", "cemetery", "commercial", "construction",
        "farmland", "farmyard", "forest", "garages", "grass", "greenfield", "industrial",
        "meadow", "military", "orchard", "quarry", "railway", "recreation_ground",
        "reservoir", "residential", "retail", "vineyard", "other",
    ],
    "leisure": [
        "common", "dog_park", "fitness_centre", "garden", "golf_course", "marina",
        "nature_reserve", "park", "pitch", "playground", "sports_centre", "stadium",
        "swimming_pool", "track", "water_park", "other",
    ],
    "man_made": [
        "bridge", "breakwater", "chimney", "crane", "lighthouse", "mast", "pier",
        "pipeline", "silo", "storage_tank", "tower", "water_tower", "works", "other",
    ],
    "military": ["airfield", "barracks", "bunker", "other"],
    "natural": [
        "bare_rock", "bay", "beach", "cave_entrance", "cliff", "coastline", "fell",
        "glacier", "grassland", "heath", "mud", "peak", "ridge", "rock", "sand", "scree",
        "scrub", "spring", "stone", "tree", "tree_row", "valley", "volcano", "water",
        "wetland", "wood", "other",
    ],
    "office": ["company", "estate_agent", "government", "insurance", "lawyer", "ngo", "other"],
    "place": [
        "city", "country", "county", "farm", "hamlet", "island", "islet", "locality",
        "municipality", "neighbourhood", "quarter", "region", "square", "state", "suburb",
        "town", "village", "other",
    ],
    "power": ["cable", "generator", "line", "minor_line", "plant", "pole", "substation", "tower", "other"],
    "public_transport": ["platform", "station", "stop_position", "other"],
    "railway": [
        "abandoned", "construction", "disused", "funicular", "halt", "level_crossing",
        "light_rail", "monorail", "narrow_gauge", "platform", "rail", "station", "subway",
        "tram", "other",
    ],
    "route": ["bicycle", "bus", "ferry", "hiking", "road", "train", "tram", "other"],
    "shop": [
        "alcohol", "bakery", "bicycle", "books", "butcher", "car", "car_repair", "chemist",
        "clothes", "convenience", "department_store", "doityourself", "electronics",
        "florist", "furniture", "garden_centre", "gift", "greengrocer", "hairdresser",
        "hardware", "jewelry", "kiosk", "laundry", "mall", "mobile_phone", "optician",
        "pet", "shoes", "sports", "supermarket", "toys", "travel_agency", "other",
    ],
    "sport": ["basketball", "climbing", "golf", "multi", "running", "soccer", "swimming", "tennis", "other"],
    "tourism": [
        "alpine_hut", "artwork", "attraction", "camp_site", "caravan_site", "gallery",
        "guest_house", "hostel", "hotel", "information", "motel", "museum", "picnic_site",
        "theme_park", "viewpoint", "zoo", "other",
    ],
    "waterway": [
        "canal", "dam", "ditch", "dock", "drain", "river", "riverbank", "stream", "weir",
        "other",
    ],
}


@lru_cache(maxsize=1)
def get_types() -> dict[str, int]:
    """Static ``"key.value" → feature_type`` dictionary (stable ids).

    Analog of georender_pack::osm_types::get_types() as used at
    /root/reference/src/lib.rs:61. Ids are assigned by sorted order so
    the mapping is reproducible everywhere.
    """
    entries = [f"{k}.{v}" for k, vs in _FEATURE_KEYS.items() for v in vs]
    return {name: i + 1 for i, name in enumerate(sorted(entries))}


@lru_cache(maxsize=1)
def get_type_names() -> dict[int, str]:
    return {v: k for k, v in get_types().items()}


def get_type(name: str) -> int:
    return get_types()[name]


@lru_cache(maxsize=1)
def place_other() -> int:
    """The catch-all type used as the drop filter (src/lib.rs:148,221,324)."""
    return get_types()["place.other"]


def pack_labels(tags: list[tuple[str, str]]) -> bytes:
    """Pack name tags into the georender label byte layout.

    ``varint(len(b"=" + name))  b"=" + name  ...  0x00`` — layout pinned
    by /root/reference/tests/ingest.rs:62 (``\\x0e=triangle park\\x00``)
    and :78 (empty labels == ``[0]``).
    """
    from .util import varint_encode

    out = bytearray()
    for k, v in tags:
        if k == "name" or k.startswith("name:"):
            body = b"=" + v.encode("utf-8")
            varint_encode(len(body), out)
            out += body
    out.append(0)
    return bytes(out)


def classify_one(tags: list[tuple[str, str]]) -> int:
    """feature type of one element: first ``k.v`` hit in tag order, then
    ``k.other`` for known keys, else ``place.other``."""
    types = get_types()
    other = place_other()
    for k, v in tags:
        ft = types.get(f"{k}.{v}")
        if ft is not None:
            return ft
    for k, _v in tags:
        ft = types.get(f"{k}.other")
        if ft is not None:
            return ft
    return other


def classify_batch(tags_column) -> tuple[np.ndarray, list[bytes]]:
    """Vector path over an Arrow ``list<struct<key,value>>`` column.

    Returns (ftype uint64 array, labels bytes list). The dictionary is a
    module-level static (stateless ``map_batches`` tasks are fine —
    SURVEY.md §2.6 ST1).
    """
    import pyarrow as pa

    col = tags_column
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    off = col.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(off - off[0])
    other = np.uint64(place_other())
    ftypes = np.full(n, other, dtype=np.uint64)
    labels: list[bytes] = [b"\x00"] * n
    nz = np.flatnonzero(counts)  # untagged rows (the vast majority) skip Python
    if len(nz):
        sub = col.take(pa.array(nz, pa.int64())).to_pylist()
        for j, tag_list in zip(nz, sub):
            pairs = [(t["key"], t["value"]) for t in tag_list]
            ftypes[j] = classify_one(pairs)
            labels[j] = pack_labels(pairs)
    return ftypes, labels
