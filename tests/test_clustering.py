"""Tests for grid-density clustering (occupied-cell connected
components)."""

import numpy as np
import pyarrow as pa
import pytest

PACK = 100_000


def _brute(gx, gy):
    pk = gx * PACK + gy
    cells = np.unique(pk)
    idx = {int(c): i for i, c in enumerate(cells)}
    parent = list(range(len(cells)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cset = set(cells.tolist())
    for c in cells.tolist():
        cgx, cgy = c // PACK, c % PACK
        for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1)):
            t = (cgx + dx) * PACK + (cgy + dy)
            if t in cset:
                a, b = find(idx[c]), find(idx[t])
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp = {}
    for c in cells.tolist():
        comp.setdefault(find(idx[c]), []).append(c)
    lab = {}
    for cs in comp.values():
        m = min(cs)
        for c in cs:
            lab[c] = m
    return {int(p): lab[int(p)] for p in pk}


def test_grid_cluster_matches_union_find(ray_session):
    import ray.data as rd

    from ingest_ray.clustering import grid_cluster

    rng = np.random.default_rng(3)
    n = 800
    gx = rng.integers(0, 40, n).astype(np.int64)
    gy = rng.integers(0, 25, n).astype(np.int64)
    key = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "gx": pa.array(gx, pa.int64()),
                "gy": pa.array(gy, pa.int64()),
            }
        )
    ).repartition(5)
    got = grid_cluster(ds).to_pandas()
    want_cell = _brute(gx, gy)
    gm = dict(zip(got["key"].astype(int), got["cluster"].astype(int)))
    assert gm == {int(k): want_cell[int(x * PACK + y)] for k, x, y in zip(key, gx, gy)}


def test_grid_cluster_isolated_and_diagonal(ray_session):
    """Isolated cell = singleton; diagonal touch connects (8-adjacency)."""
    import ray.data as rd

    from ingest_ray.clustering import grid_cluster

    ds = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([1, 2, 3], pa.int64()),
                "gx": pa.array([0, 1, 10], pa.int64()),
                "gy": pa.array([0, 1, 10], pa.int64()),
            }
        )
    )
    got = grid_cluster(ds).to_pandas().set_index("key")["cluster"]
    assert got[1] == 0 and got[2] == 0  # (0,0) <-> (1,1) diagonal
    assert got[3] == 10 * PACK + 10


def test_grid_cluster_lp_path_matches_driver_uf(ray_session):
    """cc_edge_threshold=0 forces the distributed label-propagation
    path; labels must equal the driver union-find path's."""
    import ray.data as rd

    from ingest_ray.clustering import grid_cluster

    rng = np.random.default_rng(7)
    n = 40
    gx = rng.integers(0, 6, n).astype(np.int64)
    gy = rng.integers(0, 5, n).astype(np.int64)
    key = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "gx": pa.array(gx, pa.int64()),
                "gy": pa.array(gy, pa.int64()),
            }
        )
    )
    via_lp = grid_cluster(ds, cc_edge_threshold=0).to_pandas()
    via_uf = grid_cluster(ds).to_pandas()
    a = dict(zip(via_lp["key"].astype(int), via_lp["cluster"].astype(int)))
    b = dict(zip(via_uf["key"].astype(int), via_uf["cluster"].astype(int)))
    assert a == b


def test_grid_cluster_guard_rejects_negative_gy(ray_session):
    import ray.data as rd

    from ingest_ray.clustering import grid_cluster

    ds = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([1], pa.int64()),
                "gx": pa.array([0], pa.int64()),
                "gy": pa.array([-1], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="packing bounds"):
        grid_cluster(ds).materialize()
