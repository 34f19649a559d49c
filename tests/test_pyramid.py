"""Zoom pyramid: ring-aware simplification, sub-pixel dropping,
re-triangulation, and the per-level store."""

import os

import numpy as np
import pyarrow as pa


def _area_feature(key, rings, kind=3):
    """rings: list of (n,2) float arrays (outer first)."""
    flat = np.concatenate([r.ravel() for r in rings]).astype(np.float32)
    lens = [len(r) for r in rings]
    roffs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    xs, ys = flat[0::2], flat[1::2]
    return {
        "key": key,
        "ftype": 1,
        "kind": kind,
        "minx": float(xs.min()),
        "miny": float(ys.min()),
        "maxx": float(xs.max()),
        "maxy": float(ys.max()),
        "positions": flat.tolist(),
        "ring_offsets": roffs.tolist(),
        "cells": [],
        "labels": b"\x00",
        "payload": b"x",
        "doc_id": "d",
        "span_idx": 0,
    }


def _to_table(rows):
    cols = {
        "key": pa.array([r["key"] for r in rows], pa.uint64()),
        "ftype": pa.array([r["ftype"] for r in rows], pa.uint64()),
        "kind": pa.array([r["kind"] for r in rows], pa.uint8()),
        "minx": pa.array([r["minx"] for r in rows], pa.float32()),
        "miny": pa.array([r["miny"] for r in rows], pa.float32()),
        "maxx": pa.array([r["maxx"] for r in rows], pa.float32()),
        "maxy": pa.array([r["maxy"] for r in rows], pa.float32()),
        "positions": pa.array([r["positions"] for r in rows], pa.list_(pa.float32())),
        "ring_offsets": pa.array([r["ring_offsets"] for r in rows], pa.list_(pa.int32())),
        "cells": pa.array([r["cells"] for r in rows], pa.list_(pa.int32())),
        "labels": pa.array([r["labels"] for r in rows], pa.binary()),
        "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "span_idx": pa.array([r["span_idx"] for r in rows], pa.int32()),
    }
    return pa.table(cols)


def _noisy_square(cx, cy, half, n_per_edge, amp, seed):
    """A square ring with `n_per_edge` jittered vertices per edge."""
    rng = np.random.default_rng(seed)
    corners = np.array(
        [[cx - half, cy - half], [cx + half, cy - half], [cx + half, cy + half], [cx - half, cy + half]]
    )
    pts = []
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        for t in np.linspace(0, 1, n_per_edge, endpoint=False):
            p = a + t * (b - a)
            # jitter along the edge normal, well under eps
            nrm = np.array([-(b - a)[1], (b - a)[0]])
            nrm = nrm / np.linalg.norm(nrm)
            pts.append(p + nrm * rng.uniform(-amp, amp))
    return np.array(pts)


def test_area_rings_simplify_and_retriangulate():
    from ingest_ray.pyramid import simplify_features_batch

    outer = _noisy_square(0, 0, 10, 25, 0.01, 1)
    hole = _noisy_square(0, 0, 4, 15, 0.01, 2)[::-1]  # opposite winding
    t = _to_table([_area_feature(7, [outer, hole])])
    out = simplify_features_batch(t, eps=0.5)
    assert len(out) == 1
    roffs = out.column("ring_offsets")[0].as_py()
    assert len(roffs) == 3  # outer + hole survive
    n_outer = roffs[1] - roffs[0]
    n_hole = roffs[2] - roffs[1]
    assert 3 <= n_outer <= 8 and 3 <= n_hole <= 8  # noise gone, corners kept
    cells = out.column("cells")[0].as_py()
    n_pts = len(out.column("positions")[0].as_py()) // 2
    assert cells and len(cells) % 3 == 0
    assert max(cells) < n_pts  # valid triangulation of the NEW vertex set
    # triangulated area ≈ square minus hole
    pos = np.array(out.column("positions")[0].as_py()).reshape(-1, 2)
    tri = np.array(cells).reshape(-1, 3)
    a = pos[tri[:, 0]]
    b = pos[tri[:, 1]]
    c = pos[tri[:, 2]]
    area = float(np.abs(np.cross(b - a, c - a)).sum() / 2)
    assert abs(area - (400 - 64)) < 30


def test_subpixel_drop_and_point_passthrough():
    from ingest_ray.pyramid import pixel_eps, simplify_features_batch

    tiny = _area_feature(1, [_noisy_square(0, 0, 0.001, 5, 0.0001, 3)])
    pt = _area_feature(2, [np.array([[5.0, 5.0]])], kind=1)
    pt["ring_offsets"] = []
    big = _area_feature(3, [_noisy_square(0, 0, 30, 10, 0.01, 4)])
    t = _to_table([tiny, pt, big])
    eps = pixel_eps(2)  # 360/1024 ≈ 0.35
    out = simplify_features_batch(t, eps)
    keys = sorted(out.column("key").to_pylist())
    assert keys == [2, 3]  # tiny area dropped, point + big survive
    prow = out.filter(pa.compute.equal(out.column("key"), pa.scalar(2, pa.uint64())))
    assert prow.column("positions")[0].as_py() == [5.0, 5.0]
    assert prow.column("minx")[0].as_py() == 5.0  # bbox recompute exact


def test_dead_outer_ring_drops_feature():
    from ingest_ray.pyramid import simplify_features_batch

    # outer ring collapses (all collinear) while a hole would survive
    outer = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    hole = _noisy_square(1, 0.01, 0.5, 10, 0.001, 5)
    t = _to_table([_area_feature(9, [outer, hole])])
    out = simplify_features_batch(t, eps=0.1)
    assert len(out) == 0


def test_build_zoom_level_store(ray_session, tmp_path):
    import ray.data as rd

    from ingest_ray.checkpoint import read_tiles
    from ingest_ray.pyramid import build_zoom_level

    rng = np.random.default_rng(11)
    rows = []
    k = 0
    for _ in range(30):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        rows.append(_area_feature(k, [_noisy_square(cx, cy, rng.uniform(1, 15), 20, 0.02, k)]))
        k += 1
    for _ in range(20):  # sub-pixel at zoom 2
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        rows.append(_area_feature(k, [_noisy_square(cx, cy, 0.01, 5, 0.001, k)]))
        k += 1
    ds = rd.from_arrow(_to_table(rows)).repartition(4)
    zdir = os.path.join(str(tmp_path), "z2")
    manifest = build_zoom_level(ds, zdir, zoom=2, grid_divs=(4, 4), leaf_capacity=16)
    total = int(manifest.to_pandas()["rows"].sum())
    assert total == 30  # every sub-pixel feature dropped, rest kept
    back = read_tiles(zdir).take_all()
    assert len(back) == 30
    for r in back:
        n_pts = len(r["positions"]) // 2
        assert 3 <= n_pts <= 10  # simplified well below the 80 input pts
        cells = r["cells"]
        assert len(cells) % 3 == 0 and max(cells) < n_pts
