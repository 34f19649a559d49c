"""Tiling + checkpoint tests (SURVEY.md §5 items 2-3)."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from ingest_ray.tiles import assign_grid_cell, divide_cell_group, quad_divide


def _features_table(minx, miny, maxx, maxy, kinds, cell=None):
    n = len(minx)
    d = {
        "key": pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),
        "kind": pa.array(kinds, pa.uint8()),
        "minx": pa.array(minx, pa.float32()),
        "miny": pa.array(miny, pa.float32()),
        "maxx": pa.array(maxx, pa.float32()),
        "maxy": pa.array(maxy, pa.float32()),
    }
    if cell is not None:
        d["tile_cell"] = pa.array([cell] * n, pa.int32())
    return pa.table(d)


def test_quad_divide_small_bucket_is_root():
    path, depth = quad_divide(
        (0, 0, 1, 1),
        np.array([0.1], np.float32), np.array([0.1], np.float32),
        np.array([0.1], np.float32), np.array([0.1], np.float32),
        np.array([True]), n=10,
    )
    assert path.tolist() == [1] and depth.tolist() == [0]


def test_quad_divide_partitions_and_capacity():
    rng = np.arange(400, dtype=np.float64)
    x = ((rng * 37) % 100 / 100).astype(np.float32)
    y = ((rng * 53) % 100 / 100).astype(np.float32)
    path, depth = quad_divide((0, 0, 1, 1), x, y, x, y, np.ones(400, bool), n=50)
    # every feature got exactly one leaf; leaves respect capacity
    import collections

    sizes = collections.Counter(zip(path.tolist(), depth.tolist()))
    assert sum(sizes.values()) == 400
    assert all(s <= 50 for s in sizes.values())
    assert (depth >= 1).all()


def test_quad_divide_all_big_stops():
    # interval features larger than the cell span at every level
    n = 5
    minx = np.full(n, -10.0, np.float32)
    maxx = np.full(n, 10.0, np.float32)
    path, depth = quad_divide((0, 0, 1, 1), minx, minx, maxx, maxx, np.zeros(n, bool), n=2)
    # they all pile into one child and stop via the all_big rule
    assert len(set(path.tolist())) == 1
    assert depth.max() <= 2


def test_quad_divide_degenerate_goes_child0():
    # zero-extent interval on the midline: all overlaps 0 → child 0
    # (divide.rs best init (0.0, 0))
    n = 3
    x = np.full(n, 0.5, np.float32)
    path, depth = quad_divide((0, 0, 1, 1), x, x, x, x, np.zeros(n, bool), n=1)
    assert all(p >> (2 * (d - 1) + 0) >= 0 for p, d in zip(path, depth))
    first_step = [(int(p) >> (2 * (int(d) - 1))) & 3 for p, d in zip(path, depth)]
    assert set(first_step) == {0}


def test_grid_owner_deterministic_partition():
    n = 1000
    x = (np.arange(n) * 7919 % 3600 / 10 - 180).astype(np.float32)
    y = (np.arange(n) * 104729 % 1800 / 10 - 90).astype(np.float32)
    t = _features_table(x, y, x + 0.5, y + 0.5, np.ones(n, np.uint8) * 3)
    out = assign_grid_cell(t, (-180, -90, 180.5, 90.5), (8, 8))
    cells = out.column("tile_cell").to_numpy()
    assert len(cells) == n
    assert cells.min() >= 0 and cells.max() < 64
    # deterministic
    out2 = assign_grid_cell(t, (-180, -90, 180.5, 90.5), (8, 8))
    assert (out2.column("tile_cell").to_numpy() == cells).all()


def test_optimize_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from ingest_ray.checkpoint import completed_cells, optimize_to_tiles, read_tiles

    n = 500
    x = (np.arange(n) * 7919 % 3600 / 10 - 180).astype(np.float32)
    y = (np.arange(n) * 104729 % 1800 / 10 - 90).astype(np.float32)
    t = _features_table(x, y, x, y, np.ones(n, np.uint8))
    out_dir = str(tmp_path / "tiles_out")

    ds = rd.from_arrow(t)
    manifest = optimize_to_tiles(ds, out_dir, grid_divs=(4, 4), leaf_capacity=100)
    man_rows = manifest.take_all()
    assert sum(r["rows"] for r in man_rows) == n

    done = completed_cells(out_dir)
    assert len(done) > 0

    back = read_tiles(out_dir)
    assert back.count() == n
    # every feature in exactly one tile file
    keys = sorted(r["key"] for r in back.select_columns(["key"]).take_all())
    assert keys == sorted(range(n))

    # resume: drop one cell's manifest → only that cell re-runs
    victim = sorted(done)[0]
    os.remove(os.path.join(out_dir, "manifest", f"c{victim:05d}.json"))
    manifest2 = optimize_to_tiles(rd.from_arrow(t), out_dir, grid_divs=(4, 4), leaf_capacity=100)
    rows2 = manifest2.take_all()
    assert {r["cell"] for r in rows2} == {victim}
    assert read_tiles(out_dir).count() == n


def test_aggregated_write_mode_byte_equals_exact(ray_session, tmp_path):
    """optimize_to_tiles(divide="aggregated") — the skew-defused write
    that shuffles by PHYSICAL TILE instead of grid cell — must produce
    a byte-identical store (tile files) and equivalent manifests to
    the exact per-cell path, on a corpus big enough for multi-level
    divides."""
    import ray.data as rd

    from ingest_ray.checkpoint import optimize_to_tiles, read_tiles
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import synth_documents

    docs = rd.from_arrow(synth_documents(30_000))
    feats = ingest_features(docs, EngineConfig(join_mode="broadcast")).materialize()

    exact = str(tmp_path / "exact")
    aggr = str(tmp_path / "aggr")
    optimize_to_tiles(
        feats, exact, grid_divs=(4, 4), leaf_capacity=64, resume=False
    ).materialize()
    optimize_to_tiles(
        feats, aggr, grid_divs=(4, 4), leaf_capacity=64, resume=False,
        divide="aggregated",
    ).materialize()

    def tile_files(root):
        out = {}
        troot = os.path.join(root, "tiles")
        for dirpath, _dirs, names in os.walk(troot):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, troot)] = p
        return out

    ef, af = tile_files(exact), tile_files(aggr)
    assert set(ef) == set(af) and len(ef) > 10
    for rel in ef:
        with open(ef[rel], "rb") as a, open(af[rel], "rb") as b:
            assert a.read() == b.read(), f"tile file {rel} bytes differ"

    # manifests: identical content modulo wall_s
    for name in sorted(os.listdir(os.path.join(exact, "manifest"))):
        with open(os.path.join(exact, "manifest", name)) as f:
            me = json.load(f)
        with open(os.path.join(aggr, "manifest", name)) as f:
            ma = json.load(f)
        me.pop("wall_s"), ma.pop("wall_s")
        assert me == ma, f"manifest {name} differs"

    a = sorted(
        (r["key"], r["tile_cell"], r["tile_path"]) for r in read_tiles(exact).take_all()
    )
    b = sorted(
        (r["key"], r["tile_cell"], r["tile_path"]) for r in read_tiles(aggr).take_all()
    )
    assert a == b


def test_augment_at_writer_byte_equals_post_map(ray_session, tmp_path):
    """optimize_to_tiles(augment=add_cell_columns) — derived H3/S2
    columns computed INSIDE the writers, post-shuffle — must produce a
    byte-identical store to computing them upstream via post_map, on
    BOTH divide modes (the augment keeps 56 B/row of cell columns out
    of the tile all-to-all; see checkpoint._apply_augment)."""
    import ray.data as rd

    from ingest_ray.cells import add_cell_columns
    from ingest_ray.checkpoint import optimize_to_tiles
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import synth_documents

    docs = rd.from_arrow(synth_documents(30_000))
    pre = ingest_features(
        docs, EngineConfig(join_mode="broadcast", post_map=add_cell_columns)
    ).materialize()
    bare = ingest_features(docs, EngineConfig(join_mode="broadcast")).materialize()

    def tile_files(root):
        out = {}
        troot = os.path.join(root, "tiles")
        for dirpath, _dirs, names in os.walk(troot):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, troot)] = p
        return out

    for divide in ("exact", "aggregated"):
        up = str(tmp_path / f"up_{divide}")
        dn = str(tmp_path / f"dn_{divide}")
        optimize_to_tiles(
            pre, up, grid_divs=(4, 4), leaf_capacity=64, resume=False, divide=divide
        ).materialize()
        optimize_to_tiles(
            bare, dn, grid_divs=(4, 4), leaf_capacity=64, resume=False,
            divide=divide, augment=add_cell_columns,
        ).materialize()
        uf, df = tile_files(up), tile_files(dn)
        assert set(uf) == set(df) and len(uf) > 10
        for rel in uf:
            with open(uf[rel], "rb") as a, open(df[rel], "rb") as b:
                assert a.read() == b.read(), f"{divide}: tile file {rel} bytes differ"


def test_index_mode_equals_materialized(ray_session):
    """materialize_elements="index" (two-pass streaming: pruned index
    projection only, full element table never materialized) must equal
    the materialized path feature-for-feature."""
    import ray.data as rd

    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import synth_documents

    docs = rd.from_arrow(synth_documents(30_000))
    base = ingest_features(
        docs, EngineConfig(join_mode="broadcast", materialize_elements=True)
    )
    idxm = ingest_features(
        docs, EngineConfig(materialize_elements="index")
    )

    def sig(ds):
        return sorted(
            (r["key"], bytes(r["payload"])) for r in ds.take_all()
        )

    a, b = sig(base), sig(idxm)
    assert len(a) > 1000
    assert a == b
