"""Partitioned tile sink with per-partition checkpoint manifests.

Replaces the reference's single-writer eyros sink + dir swap
(/root/reference/src/lib.rs:95-119, src/bin.rs:175-176) with parallel
per-cell writers:

* each grid cell's features are quad-divided and written as one
  parquet file per leaf tile under ``out/tiles/c{cell:05d}/p{path:x}
  .parquet`` — written to a temp name then atomically renamed;
* a JSON manifest per cell (``out/manifest/c{cell:05d}.json``)
  records tiles, row counts, bboxes, a content signature (xor of
  feature keys) and wall time — the lineage+metrics record demanded
  by BASELINE.json north_rule;
* resume: completed cells (manifest present + status committed) are
  filtered out BEFORE the shuffle, so a failed run re-does only its
  missing cells ("any failed tile range resumes without
  recomputation").

The manifest commit is the only serial point (it is per-cell and
independent), mirroring SURVEY.md §4's design row.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .tiles import (
    LEAF_CAPACITY,
    assign_grid_cell,
    coalesce_blocks,
    divide_cell_group,
    global_bounds,
)

MANIFEST_VERSION = 1


def _manifest_dir(out_path: str) -> str:
    return os.path.join(out_path, "manifest")


def completed_cells(out_path: str) -> set[int]:
    """Cells with committed manifests (the resume set)."""
    mdir = _manifest_dir(out_path)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("status") == "committed":
                done.add(int(m["cell"]))
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn write → cell re-runs
    return done


def write_cell_group(group: pa.Table, out_path: str, leaf_capacity: int = LEAF_CAPACITY) -> pa.Table:
    """map_groups body: divide one cell, write its tiles, commit manifest.

    Returns the manifest as rows (cell, tile_path, rows, file) so the
    driver can aggregate metrics without re-reading JSON.
    """
    t0 = time.time()
    tiled = divide_cell_group(group, leaf_capacity)
    cell = int(tiled.column("tile_cell")[0].as_py())
    paths = tiled.column("tile_path").to_numpy(zero_copy_only=False)
    keys = tiled.column("key").to_numpy(zero_copy_only=False)

    cell_dir = os.path.join(out_path, "tiles", f"c{cell:05d}")
    os.makedirs(cell_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_path), exist_ok=True)

    tiles_meta = []
    for p in np.unique(paths):
        mask = paths == p
        sub = tiled.filter(pa.array(mask))
        fname = f"p{int(p):x}.parquet"
        final = os.path.join(cell_dir, fname)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(sub, tmp)
        os.replace(tmp, final)  # atomic commit (S7 analog)
        sig = int(np.bitwise_xor.reduce(keys[mask].astype(np.uint64))) if mask.any() else 0
        tiles_meta.append(
            {
                "path": int(p),
                "rows": int(mask.sum()),
                "file": os.path.join(f"c{cell:05d}", fname),
                "bbox": [
                    float(sub.column("minx").to_numpy(zero_copy_only=False).min()),
                    float(sub.column("miny").to_numpy(zero_copy_only=False).min()),
                    float(sub.column("maxx").to_numpy(zero_copy_only=False).max()),
                    float(sub.column("maxy").to_numpy(zero_copy_only=False).max()),
                ],
                "key_xor": sig,
            }
        )

    manifest = {
        "version": MANIFEST_VERSION,
        "cell": cell,
        "status": "committed",
        "rows": len(tiled),
        "tiles": tiles_meta,
        "wall_s": round(time.time() - t0, 4),
    }
    mpath = os.path.join(_manifest_dir(out_path), f"c{cell:05d}.json")
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)

    return pa.table(
        {
            "cell": pa.array([cell] * len(tiles_meta), pa.int32()),
            "tile_path": pa.array([t["path"] for t in tiles_meta], pa.int64()),
            "rows": pa.array([t["rows"] for t in tiles_meta], pa.int64()),
            "file": pa.array([t["file"] for t in tiles_meta], pa.string()),
        }
    )


def optimize_to_tiles(
    features_ds,
    out_path: str,
    grid_divs: tuple[int, int] = (8, 8),
    leaf_capacity: int = LEAF_CAPACITY,
    resume: bool = True,
    bounds: tuple[float, float, float, float] | None = None,
):
    """The full optimize pass: bounds → owner cells → (skip completed)
    → per-cell divide+write. Returns the manifest Dataset.

    Equivalent of Ingest::optimize (/root/reference/src/lib.rs:408-602)
    with the skip-map dedup replaced by owner-cell assignment and the
    single root-builder replaced by per-cell manifests.
    """
    if bounds is None:
        # avoid double DAG execution (bounds aggregate + shuffle):
        # materialize the (small, about-to-shuffle) features first
        features_ds = features_ds.materialize()
        bounds = global_bounds(features_ds)
    features_ds = coalesce_blocks(features_ds)
    os.makedirs(out_path, exist_ok=True)
    with open(os.path.join(out_path, "bounds.json"), "w") as f:
        json.dump({"bounds": list(bounds), "grid_divs": list(grid_divs)}, f)

    with_cell = features_ds.map_batches(
        lambda b: assign_grid_cell(b, bounds, grid_divs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if resume:
        done = completed_cells(out_path)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int32)

            def skip_done(batch: pa.Table) -> pa.Table:
                cells = batch.column("tile_cell").to_numpy(zero_copy_only=False)
                keep = ~np.isin(cells, done_arr)
                return batch.filter(pa.array(keep))

            with_cell = with_cell.map_batches(
                skip_done, batch_format="pyarrow", zero_copy_batch=True
            )

    return with_cell.groupby("tile_cell").map_groups(
        lambda g: write_cell_group(g, out_path, leaf_capacity),
        batch_format="pyarrow",
    )


def _stage_marker(path: str) -> str:
    return path + "._committed.json"


def _commit_stage(path: str, meta: dict) -> None:
    tmp = _stage_marker(path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"version": MANIFEST_VERSION, **meta}, f)
    os.replace(tmp, _stage_marker(path))


def staged_ingest(docs_ds, out_path: str, cfg=None, resume: bool = True):
    """Stage-checkpointed ingest: documents → elements parquet →
    features parquet, each stage committed atomically (write to a temp
    dir, rename, then marker). A killed run resumes from the last
    committed stage — the analog of the reference persisting its scan
    index so a restart never re-scans (/root/reference/src/bin.rs:89-112);
    here a failed ENCODE run additionally skips the parse.

    ``docs_ds`` may be None when the elements stage is already
    committed (resume never touches the documents). Returns the
    features Dataset (read from the committed stage).
    """
    import shutil

    import ray.data as rd

    from .config import EngineConfig
    from .elements import elements_all_dataset
    from .pipeline import ingest_features

    cfg = cfg or EngineConfig()
    sdir = os.path.join(out_path, "_stage")
    edir = os.path.join(sdir, "elements")
    fdir = os.path.join(sdir, "features")
    os.makedirs(sdir, exist_ok=True)

    if resume and os.path.isfile(_stage_marker(fdir)):
        return rd.read_parquet(fdir)

    if resume and os.path.isfile(_stage_marker(edir)):
        all_el = rd.read_parquet(edir)
    else:
        if docs_ds is None:
            raise ValueError("elements stage not committed and no documents given")
        tmp = edir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        elements_all_dataset(docs_ds).write_parquet(tmp)
        shutil.rmtree(edir, ignore_errors=True)
        os.replace(tmp, edir)
        _commit_stage(edir, {"stage": "elements"})
        all_el = rd.read_parquet(edir)

    feats = ingest_features(None, cfg, all_el=all_el)
    tmp = fdir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    feats.write_parquet(tmp)
    shutil.rmtree(fdir, ignore_errors=True)
    os.replace(tmp, fdir)
    _commit_stage(fdir, {"stage": "features"})
    return rd.read_parquet(fdir)


def read_tiles(out_path: str):
    """Read the committed tile store back as a Dataset (pruned by the
    manifest, not a blind directory glob)."""
    import ray.data as rd

    files = []
    for m in sorted(os.listdir(_manifest_dir(out_path))):
        if not m.endswith(".json"):
            continue
        with open(os.path.join(_manifest_dir(out_path), m)) as f:
            man = json.load(f)
        if man.get("status") == "committed":
            files += [os.path.join(out_path, "tiles", t["file"]) for t in man["tiles"]]
    return rd.read_parquet(files)
