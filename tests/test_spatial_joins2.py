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


def _rand_segs(rng, n, span=2000, max_len=120, key0=0):
    """Integer-coordinate random segments (orientation tests exact)."""
    ax = rng.integers(0, span, n)
    ay = rng.integers(0, span, n)
    bx = ax + rng.integers(-max_len, max_len + 1, n)
    by = ay + rng.integers(-max_len, max_len + 1, n)
    return pa.table(
        {
            "key": pa.array(np.arange(key0, key0 + n), pa.int64()),
            "ax": pa.array(ax.astype(np.float64), pa.float64()),
            "ay": pa.array(ay.astype(np.float64), pa.float64()),
            "bx": pa.array(bx.astype(np.float64), pa.float64()),
            "by": pa.array(by.astype(np.float64), pa.float64()),
        }
    )


def _brute_seg_pairs(lt, rt):
    from ingest_ray.spatial import _segments_intersect

    la = {c: lt.column(c).to_numpy() for c in ("key", "ax", "ay", "bx", "by")}
    ra = {c: rt.column(c).to_numpy() for c in ("key", "ax", "ay", "bx", "by")}
    nl, nr = len(la["key"]), len(ra["key"])
    li = np.repeat(np.arange(nl), nr)
    ri = np.tile(np.arange(nr), nl)
    hit = _segments_intersect(
        la["ax"][li], la["ay"][li], la["bx"][li], la["by"][li],
        ra["ax"][ri], ra["ay"][ri], ra["bx"][ri], ra["by"][ri],
    )
    return set(zip(la["key"][li[hit]].tolist(), ra["key"][ri[hit]].tolist()))


def test_segment_join_matches_brute(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import segment_intersection_join

    rng = np.random.default_rng(21)
    lt = _rand_segs(rng, 250, key0=0)
    rt = _rand_segs(rng, 300, key0=10_000)
    got = segment_intersection_join(
        rd.from_arrow(lt).repartition(4),
        rd.from_arrow(rt).repartition(5),
        cell=64.0,
        num_buckets=16,
    ).to_pandas()
    pairs = set(zip(got["l_key"], got["r_key"]))
    assert len(pairs) == len(got), "duplicate pairs emitted"
    assert pairs == _brute_seg_pairs(lt, rt)


def test_segment_join_big_segment_paths(ray_session):
    """A segment covering > cover_cap cells rides the all-bucket route;
    output still equals brute force with no duplicates (incl. big x big
    collinear overlap)."""
    import ray.data as rd

    from ingest_ray.spatial import segment_intersection_join

    rng = np.random.default_rng(22)
    lt = _rand_segs(rng, 120, key0=0)
    # giant diagonal + giant collinear twin on the right side
    giant = pa.table(
        {
            "key": pa.array([99_991, 99_992], pa.int64()),
            "ax": pa.array([-1e6, -5e5], pa.float64()),
            "ay": pa.array([-1e6, -5e5], pa.float64()),
            "bx": pa.array([1e6, 5e5], pa.float64()),
            "by": pa.array([1e6, 5e5], pa.float64()),
        }
    )
    lt_big = pa.concat_tables([lt, giant.set_column(0, "key", pa.array([51, 52], pa.int64()))])
    rt = pa.concat_tables([_rand_segs(rng, 150, key0=10_000), giant])
    got = segment_intersection_join(
        rd.from_arrow(lt_big).repartition(3),
        rd.from_arrow(rt).repartition(4),
        cell=64.0,
        num_buckets=8,
        cover_cap=256,
    ).to_pandas()
    pairs = set(zip(got["l_key"], got["r_key"]))
    assert len(pairs) == len(got), "duplicate pairs emitted"
    assert pairs == _brute_seg_pairs(lt_big, rt)


def test_segment_join_equals_broadcast_twin(ray_session):
    import ray.data as rd

    from ingest_ray.spatial import (
        segment_intersection_join,
        segment_intersection_join_broadcast,
    )

    rng = np.random.default_rng(23)
    lt = _rand_segs(rng, 180, key0=0)
    rt = _rand_segs(rng, 160, key0=5_000)
    part = segment_intersection_join(
        rd.from_arrow(lt).repartition(4), rd.from_arrow(rt), cell=100.0
    ).to_pandas()
    bcast = segment_intersection_join_broadcast(
        rd.from_arrow(lt).repartition(4), rt
    ).to_pandas()
    assert set(zip(part["l_key"], part["r_key"])) == set(
        zip(bcast["l_key"], bcast["r_key"])
    )


def test_segment_touch_cases(ray_session):
    """Endpoint touching, T-junction, collinear overlap, and disjoint
    collinear segments."""
    from ingest_ray.spatial import _segments_intersect

    lax = np.array([0.0, 0.0, 0.0, 0.0])
    lay = np.array([0.0, 0.0, 0.0, 0.0])
    lbx = np.array([10.0, 10.0, 10.0, 10.0])
    lby = np.array([0.0, 0.0, 0.0, 0.0])
    rax = np.array([10.0, 5.0, 5.0, 11.0])
    ray_ = np.array([0.0, 0.0, 0.0, 0.0])
    rbx = np.array([20.0, 5.0, 15.0, 20.0])
    rby = np.array([10.0, 7.0, 0.0, 0.0])
    got = _segments_intersect(lax, lay, lbx, lby, rax, ray_, rbx, rby)
    assert got.tolist() == [True, True, True, False]
