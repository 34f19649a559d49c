"""ingest_ray — a Ray-Data-native spatial ingest + query engine.

A from-scratch re-expression of the capabilities of peermaps/ingest
(reference at /root/reference, v4.0.1) on top of ``ray.data.Dataset``
pipelines: interleaved text+media documents carrying georender-encoded
OSM-style elements are parsed, denormalized via distributed hash joins,
encoded into binary georender features with H3-style/S2 cell indexes,
and assigned to peermaps quadtiles with skew-aware shuffles and
per-partition checkpoint manifests.

Nothing here calls ``ray.init`` — sessions are owned by the caller
(bench.py, CLI, test fixture, or the grading driver).
"""

__version__ = "0.1.0"
