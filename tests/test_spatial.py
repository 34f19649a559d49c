"""Cells + spatial join tests."""

import numpy as np
import pyarrow as pa
import pytest

from ingest_ray.cells import (
    hex_cell,
    hex_k_ring,
    hex_k_rings_batch,
    s2_cell_id,
    s2_level,
    s2_parent,
)


def test_s2_face_centers():
    for lon, lat, face in [(0, 0, 0), (90, 0, 1), (0, 90, 2), (180, 0, 3), (-90, 0, 4), (0, -90, 5)]:
        lid = s2_cell_id(np.array([float(lon)]), np.array([float(lat)]), 0)[0]
        assert int(lid) == ((2 * face + 1) << 60)


def test_s2_parent_consistency():
    leaf = s2_cell_id(np.array([13.02]), np.array([37.0]), 30)
    for lvl in (0, 5, 7, 12, 29):
        direct = s2_cell_id(np.array([13.02]), np.array([37.0]), lvl)[0]
        assert direct == s2_parent(leaf, lvl)[0]
        assert s2_level(np.array([direct]))[0] == lvl


def test_s2_locality_and_vectorization():
    lons = np.array([13.0200, 13.0201, -70.0])
    lats = np.array([37.0, 37.0, -37.0])
    ids = s2_cell_id(lons, lats, 12)
    assert ids[0] == ids[1] and ids[0] != ids[2]


def test_hex_kring_counts():
    c = int(hex_cell(np.array([13.0]), np.array([37.0]), 9)[0])
    for k in range(5):
        assert len(hex_k_ring(c, k)) == 1 + 3 * k * (k + 1)
    flat, offs = hex_k_rings_batch(np.array([c, c], dtype=np.uint64), 2)
    assert len(flat) == 2 * 19 and offs.tolist() == [0, 19, 38]


def test_hex_determinism_and_res_scaling():
    a = hex_cell(np.array([13.0]), np.array([37.0]), 9)[0]
    b = hex_cell(np.array([13.0]), np.array([37.0]), 9)[0]
    assert a == b
    # finer res → different (more) cells over an interval
    xs = np.linspace(13.0, 13.5, 200)
    ys = np.full(200, 37.0)
    assert len(np.unique(hex_cell(xs, ys, 10))) > len(np.unique(hex_cell(xs, ys, 7)))


def _poly_features(polys):
    """polys: list of (key, rings) where rings = list of [x,y,...] lists."""
    rows = []
    for key, rings in polys:
        pos = [c for ring in rings for c in ring]
        offs = [0]
        for ring in rings:
            offs.append(offs[-1] + len(ring) // 2)
        xs = pos[0::2]
        ys = pos[1::2]
        rows.append(
            {
                "key": key,
                "positions": pos,
                "ring_offsets": offs,
                "minx": min(xs),
                "miny": min(ys),
                "maxx": max(xs),
                "maxy": max(ys),
            }
        )
    return pa.Table.from_pylist(rows)


def test_pip_join(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import pip_join

    polys = _poly_features(
        [
            (1, [[0, 0, 4, 0, 4, 4, 0, 4], [1, 1, 3, 1, 3, 3, 1, 3]]),  # square w/ hole
            (2, [[10, 10, 12, 10, 12, 12, 10, 12]]),
        ]
    )
    pts = rd.from_arrow(
        pa.table(
            {
                "pid": pa.array([0, 1, 2, 3], pa.int64()),
                "lon": pa.array([0.5, 2.0, 11.0, 50.0], pa.float64()),
                "lat": pa.array([0.5, 2.0, 11.0, 50.0], pa.float64()),
            }
        )
    )
    out = pip_join(pts, polys, keep_cols=("pid",)).take_all()
    hits = {(r["pid"], r["poly_key"]) for r in out}
    assert hits == {(0, 1), (2, 2)}  # point 1 is in the hole, 3 outside


def test_knn_join(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import knn_join

    n = 200
    xs = (np.arange(n) % 20).astype(np.float64) * 0.01
    ys = (np.arange(n) // 20).astype(np.float64) * 0.01
    corpus = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(xs, pa.float64()),
            "lat": pa.array(ys, pa.float64()),
        }
    )
    queries = rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([0, 1], pa.int64()),
                "lon": pa.array([0.0, 0.105], pa.float64()),
                "lat": pa.array([0.0, 0.05], pa.float64()),
            }
        )
    )
    out = knn_join(queries, corpus, k=3, res=9, concurrency=2).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1}
    for q, rows in by_q.items():
        assert len(rows) == 3
        d = [r["dist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert d == sorted(d)
    # brute-force check for query 0 at (0,0): nearest is id 0 dist 0
    r0 = min(by_q[0], key=lambda r: r["rank"])
    assert r0["neighbor_id"] == 0 and r0["dist"] == 0.0


def test_raster_vector_join(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import raster_vector_join, synth_raster_chips

    chips = synth_raster_chips((0, 0, 2, 2), res=6)
    feats = pa.table(
        {
            "key": pa.array([7, 8], pa.uint64()),
            "minx": pa.array([0.1, 10.0], pa.float32()),
            "miny": pa.array([0.1, 10.0], pa.float32()),
            "maxx": pa.array([0.5, 11.0], pa.float32()),
            "maxy": pa.array([0.5, 11.0], pa.float32()),
        }
    )
    out = raster_vector_join(rd.from_arrow(feats), chips, res=6).take_all()
    got = {r["key"]: r for r in out}
    assert 7 in got and got[7]["chips"] >= 1
    assert 8 not in got  # outside the raster extent


def _rand_points(n, seed, span=3.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0, span, n), rng.uniform(0, span, n))


def test_pip_partitioned_equals_broadcast(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import pip_join, pip_join_partitioned

    rng = np.random.default_rng(9)
    polys = []
    for key in range(1, 25):
        cx, cy = rng.uniform(0.3, 2.7, 2)
        w, h = rng.uniform(0.05, 0.4, 2)
        ring = [cx - w, cy - h, cx + w, cy - h, cx + w, cy + h, cx - w, cy + h]
        rings = [ring]
        if key % 3 == 0:  # hole
            rings.append([cx - w / 3, cy - h / 3, cx + w / 3, cy - h / 3,
                          cx + w / 3, cy + h / 3, cx - w / 3, cy + h / 3])
        polys.append((key, rings))
    poly_tbl = _poly_features(polys)
    px, py = _rand_points(800, 10)
    pts_tbl = pa.table(
        {
            "pid": pa.array(np.arange(800), pa.int64()),
            "lon": pa.array(px, pa.float64()),
            "lat": pa.array(py, pa.float64()),
        }
    )
    pts = rd.from_arrow(pts_tbl)
    bc = pip_join(pts, poly_tbl, keep_cols=("pid",)).take_all()
    pt = pip_join_partitioned(
        pts, rd.from_arrow(poly_tbl), keep_cols=("pid",), res=4
    ).take_all()
    a = sorted((int(r["pid"]), int(r["poly_key"])) for r in bc)
    b = sorted((int(r["pid"]), int(r["poly_key"])) for r in pt)
    assert a == b and len(a) > 0


def test_pip_partitioned_world_spanning_polygon(ray_session):
    """Regression for the round-2 bench crash: a polygon whose bbox
    cover at res 5 exceeds 10⁵ cells must NOT replicate per cover cell
    (geometry ships once per bucket, ≤ num_buckets copies) and must
    still match the broadcast kernel exactly."""
    import ray.data as rd

    from ingest_ray.cells import hex_cover_bbox
    from ingest_ray.spatial import pip_join, pip_join_partitioned

    # world-spanning diamond + a small square, mirroring the synthetic
    # relations that crashed the sf0.1 bench
    world = [-179.0, 0.0, 0.0, -85.0, 179.0, 0.0, 0.0, 85.0]
    small = [10.0, 10.0, 12.0, 10.0, 12.0, 12.0, 10.0, 12.0]
    poly_tbl = _poly_features([(1, [world]), (2, [small])])
    assert len(hex_cover_bbox(-179.0, -85.0, 179.0, 85.0, 5)) >= 100_000

    rng = np.random.default_rng(21)
    n = 500
    pts_tbl = pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(rng.uniform(-179, 179, n), pa.float64()),
            "lat": pa.array(rng.uniform(-85, 85, n), pa.float64()),
        }
    )
    pts = rd.from_arrow(pts_tbl)
    bc = pip_join(pts, poly_tbl, keep_cols=("pid",)).take_all()
    pt = pip_join_partitioned(
        pts, rd.from_arrow(poly_tbl), keep_cols=("pid",), res=5
    ).take_all()
    a = sorted((int(r["pid"]), int(r["poly_key"])) for r in bc)
    b = sorted((int(r["pid"]), int(r["poly_key"])) for r in pt)
    assert a == b and len(a) > 0


def test_knn_partitioned_equals_broadcast(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import knn_join, knn_join_partitioned

    rng = np.random.default_rng(11)
    n = 600
    xs = rng.uniform(0, 2, n)
    ys = rng.uniform(0, 2, n)
    corpus_tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(xs, pa.float64()),
            "lat": pa.array(ys, pa.float64()),
        }
    )
    qx, qy = _rand_points(60, 12, span=2.0)
    q_tbl = pa.table(
        {
            "qid": pa.array(np.arange(60), pa.int64()),
            "lon": pa.array(qx, pa.float64()),
            "lat": pa.array(qy, pa.float64()),
        }
    )
    queries = rd.from_arrow(q_tbl)
    bc = knn_join(queries, corpus_tbl, k=4, res=8, concurrency=2).take_all()
    pt = knn_join_partitioned(
        queries, rd.from_arrow(corpus_tbl), k=4, res=8
    ).take_all()
    a = sorted((r["qid"], r["rank"], r["neighbor_id"], round(r["dist"], 12)) for r in bc)
    b = sorted((r["qid"], r["rank"], r["neighbor_id"], round(r["dist"], 12)) for r in pt)
    assert a == b and len(a) >= 60 * 3  # some queries exhaust max_ring below k


def test_raster_partitioned_equals_broadcast(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import (
        raster_vector_join,
        raster_vector_join_partitioned,
        synth_raster_chips,
    )

    chips = synth_raster_chips((0, 0, 3, 3), res=6)
    rng = np.random.default_rng(13)
    n = 120
    minx = rng.uniform(0, 2.5, n).astype(np.float32)
    miny = rng.uniform(0, 2.5, n).astype(np.float32)
    feats = pa.table(
        {
            "key": pa.array(np.arange(1, n + 1), pa.uint64()),
            "minx": pa.array(minx, pa.float32()),
            "miny": pa.array(miny, pa.float32()),
            "maxx": pa.array(minx + rng.uniform(0.05, 0.5, n).astype(np.float32), pa.float32()),
            "maxy": pa.array(miny + rng.uniform(0.05, 0.5, n).astype(np.float32), pa.float32()),
        }
    )
    fds = rd.from_arrow(feats)
    bc = raster_vector_join(fds, chips, res=6).take_all()
    pt = raster_vector_join_partitioned(fds, rd.from_arrow(chips), res=6).take_all()
    a = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in bc)
    b = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in pt)
    assert a == b and len(a) > 0


def test_raster_partitioned_world_spanning_feature(ray_session):
    """Regression: a feature with a near-global bbox must not
    enumerate its full cover (clip to raster extent + over-cap routing
    via hex_cover_contains) and must still match the broadcast
    kernel — including with a cap low enough to force the big-feature
    branch."""
    import ray.data as rd

    from ingest_ray.spatial import (
        raster_vector_join,
        raster_vector_join_partitioned,
        synth_raster_chips,
    )

    chips = synth_raster_chips((0, 0, 3, 3), res=6)
    feats = pa.table(
        {
            "key": pa.array([1, 2, 3], pa.uint64()),
            "minx": pa.array([-179.0, 0.2, 50.0], pa.float32()),
            "miny": pa.array([-85.0, 0.2, 50.0], pa.float32()),
            "maxx": pa.array([179.0, 1.1, 60.0], pa.float32()),
            "maxy": pa.array([85.0, 1.4, 60.0], pa.float32()),
        }
    )
    fds = rd.from_arrow(feats)
    bc = raster_vector_join(fds, chips, res=6).take_all()
    for cap in (4096, 50):  # 50 forces key 2 through the big branch too
        pt = raster_vector_join_partitioned(
            fds, rd.from_arrow(chips), res=6, cover_cap=cap
        ).take_all()
        a = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in bc)
        b = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in pt)
        assert a == b and {x[0] for x in a} == {1, 2}


def test_raster_partitioned_empty_chips(ray_session):
    """An empty chip table must yield the empty result, not a crash in
    the extent aggregate."""
    import ray.data as rd

    from ingest_ray.spatial import raster_vector_join_partitioned

    chips = pa.table(
        {"cell": pa.array([], pa.uint64()), "band_mean": pa.array([], pa.float64())}
    )
    feats = pa.table(
        {
            "key": pa.array([1], pa.uint64()),
            "minx": pa.array([0.0], pa.float32()),
            "miny": pa.array([0.0], pa.float32()),
            "maxx": pa.array([1.0], pa.float32()),
            "maxy": pa.array([1.0], pa.float32()),
        }
    )
    out = raster_vector_join_partitioned(
        rd.from_arrow(feats), rd.from_arrow(chips), res=6
    )
    assert out.count() == 0
    assert set(out.schema().names) == {"key", "chip_mean", "chips"}


def test_raster_partitioned_distributed_big_side(ray_session):
    """Forcing the over-threshold path (big_collect_limit=0) must keep
    the big-feature side fully distributed and still match the
    broadcast kernel exactly."""
    import ray.data as rd

    from ingest_ray.spatial import (
        raster_vector_join,
        raster_vector_join_partitioned,
        synth_raster_chips,
    )

    chips = synth_raster_chips((0, 0, 3, 3), res=6)
    feats = pa.table(
        {
            "key": pa.array([1, 2, 3], pa.uint64()),
            "minx": pa.array([-179.0, 0.2, 50.0], pa.float32()),
            "miny": pa.array([-85.0, 0.2, 50.0], pa.float32()),
            "maxx": pa.array([179.0, 1.1, 60.0], pa.float32()),
            "maxy": pa.array([85.0, 1.4, 60.0], pa.float32()),
        }
    )
    fds = rd.from_arrow(feats)
    bc = raster_vector_join(fds, chips, res=6).take_all()
    pt = raster_vector_join_partitioned(
        fds, rd.from_arrow(chips), res=6, cover_cap=50, big_collect_limit=0
    ).take_all()
    a = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in bc)
    b = sorted((int(r["key"]), int(r["chips"]), round(r["chip_mean"], 9)) for r in pt)
    assert a == b and {x[0] for x in a} == {1, 2}
