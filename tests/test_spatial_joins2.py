"""Property tests for the round-4 spatial joins: within-radius distance
join and the PBSM bbox-overlap join with reference-point dedup."""

import numpy as np
import pyarrow as pa
import pytest  # noqa: F401


def _rand_rects(rng, n, span=360.0, max_half=20.0, key0=0):
    cx = rng.uniform(-span / 2, span / 2, n)
    cy = rng.uniform(-90, 90, n)
    hw = rng.uniform(0.01, max_half, n)
    hh = rng.uniform(0.01, max_half, n)
    return pa.table(
        {
            "key": pa.array(np.arange(key0, key0 + n), pa.int64()),
            "minx": pa.array(cx - hw, pa.float64()),
            "miny": pa.array(cy - hh, pa.float64()),
            "maxx": pa.array(cx + hw, pa.float64()),
            "maxy": pa.array(cy + hh, pa.float64()),
        }
    )


def _brute_pairs(lt, rt):
    lminx = lt.column("minx").to_numpy()
    lminy = lt.column("miny").to_numpy()
    lmaxx = lt.column("maxx").to_numpy()
    lmaxy = lt.column("maxy").to_numpy()
    rminx = rt.column("minx").to_numpy()
    rminy = rt.column("miny").to_numpy()
    rmaxx = rt.column("maxx").to_numpy()
    rmaxy = rt.column("maxy").to_numpy()
    lk = lt.column("key").to_numpy()
    rk = rt.column("key").to_numpy()
    hit = (
        (lminx[:, None] <= rmaxx[None, :])
        & (rminx[None, :] <= lmaxx[:, None])
        & (lminy[:, None] <= rmaxy[None, :])
        & (rminy[None, :] <= lmaxy[:, None])
    )
    li, ri = np.nonzero(hit)
    return sorted(zip(lk[li].tolist(), rk[ri].tolist()))


def test_radius_join_matches_brute_force(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import radius_join

    rng = np.random.default_rng(7)
    n, m, r = 4000, 60, 5.0
    px = rng.uniform(-180, 180, n)
    py = rng.uniform(-90, 90, n)
    qx = rng.uniform(-170, 170, m)
    qy = rng.uniform(-80, 80, m)
    pts = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(px, pa.float64()),
            "lat": pa.array(py, pa.float64()),
        }
    )
    qs = pa.table(
        {
            "qid": pa.array(np.arange(m), pa.int64()),
            "lon": pa.array(qx, pa.float64()),
            "lat": pa.array(qy, pa.float64()),
        }
    )
    got = radius_join(
        rd.from_arrow(pts).repartition(5), rd.from_arrow(qs).repartition(3), r
    ).take_all()
    got_pairs = sorted((int(x["qid"]), int(x["id"])) for x in got)
    assert len(got_pairs) == len(set(got_pairs)), "pair emitted twice"
    dx = qx[:, None] - px[None, :]
    dy = qy[:, None] - py[None, :]
    qi, pi = np.nonzero(dx * dx + dy * dy <= r * r)
    assert got_pairs == sorted(zip(qi.tolist(), pi.tolist()))
    # d2 values are exact
    d2 = {(int(x["qid"]), int(x["id"])): x["d2"] for x in got}
    for (a, b), v in list(d2.items())[:100]:
        assert v == (qx[a] - px[b]) ** 2 + (qy[a] - py[b]) ** 2


def test_radius_join_boundary_is_closed(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import radius_join

    pts = pa.table(
        {
            "id": pa.array([0, 1], pa.int64()),
            "lon": pa.array([3.0, 3.1], pa.float64()),
            "lat": pa.array([0.0, 0.0], pa.float64()),
        }
    )
    qs = pa.table(
        {
            "qid": pa.array([9], pa.int64()),
            "lon": pa.array([0.0], pa.float64()),
            "lat": pa.array([0.0], pa.float64()),
        }
    )
    out = radius_join(rd.from_arrow(pts), rd.from_arrow(qs), 3.0).take_all()
    assert sorted(int(r["id"]) for r in out) == [0]


def test_bbox_overlap_join_matches_brute(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import bbox_overlap_join

    rng = np.random.default_rng(11)
    lt = _rand_rects(rng, 500, key0=0)
    rt = _rand_rects(rng, 800, key0=10_000)
    got = bbox_overlap_join(
        rd.from_arrow(lt).repartition(4), rd.from_arrow(rt).repartition(6), cell=15.0
    ).take_all()
    pairs = sorted((int(r["l_key"]), int(r["r_key"])) for r in got)
    assert len(pairs) == len(set(pairs)), "pair emitted twice"
    assert pairs == _brute_pairs(lt, rt)


def test_bbox_overlap_join_big_rect_paths(ray_session):
    """World-spanning rectangles must ride the all-bucket route (big×
    normal AND big×big) and still come out exactly once each."""
    import ray.data as rd

    from ingest_ray.spatial import bbox_overlap_join

    rng = np.random.default_rng(13)
    lt = _rand_rects(rng, 120, key0=0)
    rt = _rand_rects(rng, 150, key0=10_000)
    world_l = pa.table(
        {
            "key": pa.array([999], pa.int64()),
            "minx": pa.array([-179.9], pa.float64()),
            "miny": pa.array([-89.9], pa.float64()),
            "maxx": pa.array([179.9], pa.float64()),
            "maxy": pa.array([89.9], pa.float64()),
        }
    )
    world_r = pa.table(
        {
            "key": pa.array([20_999], pa.int64()),
            "minx": pa.array([-170.0], pa.float64()),
            "miny": pa.array([-80.0], pa.float64()),
            "maxx": pa.array([170.0], pa.float64()),
            "maxy": pa.array([80.0], pa.float64()),
        }
    )
    lt2 = pa.concat_tables([lt, world_l])
    rt2 = pa.concat_tables([rt, world_r])
    # tiny cover_cap so even midsize rects exercise the big path
    got = bbox_overlap_join(
        rd.from_arrow(lt2).repartition(3),
        rd.from_arrow(rt2).repartition(3),
        cell=4.0,
        cover_cap=40,
    ).take_all()
    pairs = sorted((int(r["l_key"]), int(r["r_key"])) for r in got)
    assert len(pairs) == len(set(pairs)), "pair emitted twice"
    assert pairs == _brute_pairs(lt2, rt2)


def test_bbox_overlap_join_equals_broadcast_twin(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import bbox_overlap_join, bbox_overlap_join_broadcast

    rng = np.random.default_rng(17)
    lt = _rand_rects(rng, 300, key0=0)
    rt = _rand_rects(rng, 200, key0=5_000)
    part = bbox_overlap_join(
        rd.from_arrow(lt), rd.from_arrow(rt), cell=10.0, num_buckets=16
    ).take_all()
    bc = bbox_overlap_join_broadcast(rd.from_arrow(lt), rt).take_all()
    assert sorted((r["l_key"], r["r_key"]) for r in part) == sorted(
        (r["l_key"], r["r_key"]) for r in bc
    )


def test_bbox_overlap_edge_touching_rects(ray_session):
    """Closed-edge semantics: rects sharing only a boundary line (or a
    corner exactly on a cell boundary) still pair, exactly once."""
    import ray.data as rd

    from ingest_ray.spatial import bbox_overlap_join

    lt = pa.table(
        {
            "key": pa.array([1, 2], pa.int64()),
            "minx": pa.array([0.0, 32.0], pa.float64()),
            "miny": pa.array([0.0, 0.0], pa.float64()),
            "maxx": pa.array([16.0, 48.0], pa.float64()),
            "maxy": pa.array([16.0, 16.0], pa.float64()),
        }
    )
    rt = pa.table(
        {
            "key": pa.array([10, 11], pa.int64()),
            "minx": pa.array([16.0, -8.0], pa.float64()),
            "miny": pa.array([16.0, -8.0], pa.float64()),
            "maxx": pa.array([32.0, 0.0], pa.float64()),
            "maxy": pa.array([32.0, 0.0], pa.float64()),
        }
    )
    got = bbox_overlap_join(
        rd.from_arrow(lt), rd.from_arrow(rt), cell=16.0
    ).take_all()
    pairs = sorted((int(r["l_key"]), int(r["r_key"])) for r in got)
    assert pairs == _brute_pairs(lt, rt)
    assert (1, 10) in pairs and (1, 11) in pairs and (2, 10) in pairs
