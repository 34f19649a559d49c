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


def _canon_type(t: pa.DataType) -> pa.DataType:
    """Canonical nested-field names ("item"): a parquet round-trip
    renames list children to "element", which would otherwise make
    patched-store bytes differ from a fresh write of in-memory data.
    Dictionary columns decay to their value type: a dictionary's value
    ORDER depends on upstream block history, so writing it would make
    tile bytes depend on execution order."""
    if pa.types.is_dictionary(t):
        return _canon_type(t.value_type)
    if pa.types.is_list(t):
        return pa.list_(_canon_type(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_canon_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _canon_type(f.type)) for f in t])
    return t


def _canon_table(t: pa.Table) -> pa.Table:
    schema = pa.schema([pa.field(f.name, _canon_type(f.type)) for f in t.schema])
    # always cast: Arrow type equality IGNORES nested field names, so an
    # equality guard would skip exactly the rename this exists for
    return t.cast(schema)


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


def _apply_augment(group: pa.Table, augment) -> pa.Table:
    """Apply a derived-column transform to a shuffled group so output
    column ORDER matches the upstream (pre-shuffle) application: the
    tile keys (tile_cell / tile_path) are peeled off, the augment
    appends its columns, and the keys are re-appended — byte-identical
    files either way (pinned by tests)."""
    meta = [
        c for c in ("tile_cell", "tile_path", "tile_depth") if c in group.column_names
    ]
    base = group.drop_columns(meta) if meta else group
    out = augment(base)
    for c in meta:
        out = out.append_column(c, group.column(c))
    return out


def write_cell_group(
    group: pa.Table,
    out_path: str,
    leaf_capacity: int = LEAF_CAPACITY,
    augment=None,
) -> pa.Table:
    """map_groups body: divide one cell, write its tiles, commit manifest.

    Returns the manifest as rows (cell, tile_path, rows, file) so the
    driver can aggregate metrics without re-reading JSON.

    ``augment``: optional per-group table transform applied AFTER the
    shuffle, before canonicalization — the home for derived columns
    (e.g. ``cells.add_cell_columns``: six H3 resolutions + S2 = 56 B/row,
    ~31% of the tile exchange at bench shape) that are pure functions of
    the feature row. Computing them post-shuffle keeps them out of the
    all-to-all entirely; output bytes are identical to computing them
    upstream (pinned by tests).
    """
    t0 = time.time()
    if augment is not None:
        group = _apply_augment(group, augment)
    tiled = divide_cell_group(group, leaf_capacity)
    cell = int(tiled.column("tile_cell")[0].as_py())
    # canonical (tile_path, key) order: output bytes are a pure function
    # of the cell's feature SET, so an incremental patch_tiles rewrite
    # byte-matches a from-scratch run regardless of block arrival order
    paths0 = tiled.column("tile_path").to_numpy(zero_copy_only=False)
    keys0 = tiled.column("key").to_numpy(zero_copy_only=False)
    order = np.lexsort((keys0, paths0))
    # combine_chunks: parquet page/dictionary layout depends on chunk
    # boundaries; a single chunk makes output bytes chunking-invariant
    tiled = _canon_table(tiled.take(pa.array(order, pa.int64())).combine_chunks())
    paths = paths0[order]
    keys = keys0[order]

    cell_dir = os.path.join(out_path, "tiles", f"c{cell:05d}")
    os.makedirs(cell_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_path), exist_ok=True)

    starts = np.flatnonzero(np.concatenate([[True], paths[1:] != paths[:-1]]))
    ends = np.concatenate([starts[1:], [len(paths)]])
    tiles_meta = []
    for s, e in zip(starts, ends):
        p = paths[s]
        sub = tiled.slice(int(s), int(e - s))
        fname = f"p{int(p):x}.parquet"
        final = os.path.join(cell_dir, fname)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(sub, tmp)
        os.replace(tmp, final)  # atomic commit (S7 analog)
        seg_keys = keys[s:e].astype(np.uint64)
        tiles_meta.append(
            {
                "path": int(p),
                "rows": int(e - s),
                "file": os.path.join(f"c{cell:05d}", fname),
                "bbox": [
                    float(sub.column("minx").to_numpy(zero_copy_only=False).min()),
                    float(sub.column("miny").to_numpy(zero_copy_only=False).min()),
                    float(sub.column("maxx").to_numpy(zero_copy_only=False).max()),
                    float(sub.column("maxy").to_numpy(zero_copy_only=False).max()),
                ],
                "key_xor": int(np.bitwise_xor.reduce(seg_keys)),
                # key zone map: patch_tiles prunes unaffected tiles by
                # range before reading any key column
                "key_min": int(seg_keys.min()),
                "key_max": int(seg_keys.max()),
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


def write_tile_group(group: pa.Table, out_path: str, augment=None) -> pa.Table:
    """One PHYSICAL tile's rows (pre-assigned tile_cell/tile_path) →
    canonical key-sorted parquet file + one manifest-meta row.

    This is the skew-defused write body: the shuffle key is the tile,
    not the grid cell, so task size is bounded by the divide's leaf
    rule (≤ leaf_capacity except the all-big edge case) no matter how
    dense the hottest cell is. Output bytes match
    :func:`write_cell_group`'s file for the same feature set (the cell
    variant slices its canon-sorted cell table per path; here the
    per-tile table is canon-sorted directly — byte-equality is pinned
    by tests)."""
    cell = int(group.column("tile_cell")[0].as_py())
    path = int(group.column("tile_path")[0].as_py())
    if augment is not None:
        group = _apply_augment(group, augment)
    keys0 = group.column("key").to_numpy(zero_copy_only=False)
    order = np.argsort(keys0, kind="stable")
    tiled = _canon_table(group.take(pa.array(order, pa.int64())).combine_chunks())
    keys = keys0[order].astype(np.uint64)

    cell_dir = os.path.join(out_path, "tiles", f"c{cell:05d}")
    os.makedirs(cell_dir, exist_ok=True)
    fname = f"p{path:x}.parquet"
    final = os.path.join(cell_dir, fname)
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(tiled, tmp)
    os.replace(tmp, final)
    return pa.table(
        {
            "cell": pa.array([cell], pa.int32()),
            "tile_path": pa.array([path], pa.int64()),
            "rows": pa.array([len(tiled)], pa.int64()),
            "file": pa.array([os.path.join(f"c{cell:05d}", fname)], pa.string()),
            "minx": pa.array(
                [float(tiled.column("minx").to_numpy(zero_copy_only=False).min())]
            ),
            "miny": pa.array(
                [float(tiled.column("miny").to_numpy(zero_copy_only=False).min())]
            ),
            "maxx": pa.array(
                [float(tiled.column("maxx").to_numpy(zero_copy_only=False).max())]
            ),
            "maxy": pa.array(
                [float(tiled.column("maxy").to_numpy(zero_copy_only=False).max())]
            ),
            "key_xor": pa.array([int(np.bitwise_xor.reduce(keys))], pa.uint64()),
            "key_min": pa.array([int(keys.min())], pa.uint64()),
            "key_max": pa.array([int(keys.max())], pa.uint64()),
        }
    )


def _write_cell_manifest_from_metas(df, out_path: str) -> pa.Table:
    """One cell's tile-meta rows → the same committed manifest JSON
    :func:`write_cell_group` writes (tiles ordered by path). Runs as a
    map_groups body so manifest assembly is distributed — the driver
    only ever sees the per-tile summary rows."""
    df = df.sort_values("tile_path")
    cell = int(df["cell"].iloc[0])
    tiles_meta = [
        {
            "path": int(r["tile_path"]),
            "rows": int(r["rows"]),
            "file": r["file"],
            "bbox": [float(r["minx"]), float(r["miny"]), float(r["maxx"]), float(r["maxy"])],
            "key_xor": int(r["key_xor"]),
            "key_min": int(r["key_min"]),
            "key_max": int(r["key_max"]),
        }
        for _, r in df.iterrows()
    ]
    manifest = {
        "version": MANIFEST_VERSION,
        "cell": cell,
        "status": "committed",
        "rows": int(df["rows"].sum()),
        "tiles": tiles_meta,
        "wall_s": 0.0,
    }
    os.makedirs(_manifest_dir(out_path), exist_ok=True)
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
    divide: str = "exact",
    augment=None,
):
    """The full optimize pass: bounds → owner cells → (skip completed)
    → per-cell divide+write. Returns the manifest Dataset.

    ``augment``: derived-column transform (e.g. ``add_cell_columns``)
    applied INSIDE the per-group writer instead of upstream — keeps
    pure-function-of-row columns out of the tile all-to-all (56 B/row
    of H3/S2 cells ≈ 31% of exchange bytes at bench shape) while
    producing byte-identical files (see :func:`_apply_augment`).

    Equivalent of Ingest::optimize (/root/reference/src/lib.rs:408-602)
    with the skip-map dedup replaced by owner-cell assignment and the
    single root-builder replaced by per-cell manifests.

    ``divide``:

    * ``"exact"`` — groupby(grid cell) co-locates each cell and runs
      the reference divide in one task. Simple, but a dense-city cell
      is one straggler task holding the whole cell in memory — the
      planet-scale skew the north rule names.
    * ``"aggregated"`` — the skew-defused path: tile paths come from
      :func:`ingest_ray.tiles.assign_tiles_aggregated` (path-histogram
      aggregation; NO cell co-location), then the write shuffles by
      the fine-grained PHYSICAL TILE key — thousands of
      capacity-bounded groups instead of tens of unbounded cells,
      which is exactly what a salted-key exchange buys, with the salt
      being the divide's own path bits. Manifest assembly is a second
      small groupby(cell) over tile-meta rows (one row per tile, never
      per feature). Output files and manifests are byte-identical to
      the exact path (pinned by tests).
    """
    if divide == "aggregated":
        return _optimize_to_tiles_aggregated(
            features_ds, out_path, grid_divs, leaf_capacity, resume, bounds, augment
        )
    # materialize on BOTH paths (same fix as tiles.assign_tiles):
    # coalesce_blocks inspects count()/num_blocks(), which on a lazy
    # Dataset executes the whole upstream DAG once and the tile shuffle
    # a second time — a silent 2x recompute when explicit bounds skip
    # the aggregate
    features_ds = features_ds.materialize()
    if bounds is None:
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
        lambda g: write_cell_group(g, out_path, leaf_capacity, augment=augment),
        batch_format="pyarrow",
    )


def _optimize_to_tiles_aggregated(
    features_ds,
    out_path: str,
    grid_divs: tuple[int, int],
    leaf_capacity: int,
    resume: bool,
    bounds: tuple[float, float, float, float] | None,
    augment=None,
):
    """See :func:`optimize_to_tiles` ``divide="aggregated"``."""
    from .tiles import assign_tiles_aggregated

    features_ds = features_ds.materialize()
    if bounds is None:
        bounds = global_bounds(features_ds)
    os.makedirs(out_path, exist_ok=True)
    with open(os.path.join(out_path, "bounds.json"), "w") as f:
        json.dump({"bounds": list(bounds), "grid_divs": list(grid_divs)}, f)

    assigned = assign_tiles_aggregated(
        features_ds, grid_divs=grid_divs, leaf_capacity=leaf_capacity, bounds=bounds
    )
    if resume:
        done = completed_cells(out_path)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int32)

            def skip_done(batch: pa.Table) -> pa.Table:
                cells = batch.column("tile_cell").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(~np.isin(cells, done_arr)))

            assigned = assigned.map_batches(
                skip_done, batch_format="pyarrow", zero_copy_batch=True
            )

    metas = assigned.groupby(["tile_cell", "tile_path"]).map_groups(
        lambda g: write_tile_group(g, out_path, augment=augment), batch_format="pyarrow"
    )
    return metas.groupby("cell").map_groups(
        lambda df: _write_cell_manifest_from_metas(df, out_path),
        batch_format="pandas",
    )


def _read_manifests(out_path: str) -> dict[int, dict]:
    """cell → committed manifest dict."""
    mdir = _manifest_dir(out_path)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except json.JSONDecodeError:
            continue
        if m.get("status") == "committed":
            out[int(m["cell"])] = m
    return out


_TILE_COLS = ("tile_cell", "tile_path", "tile_depth")


def patch_tiles(
    out_path: str,
    delta,
    removed_keys: np.ndarray,
    leaf_capacity: int = LEAF_CAPACITY,
    augment=None,
) -> dict:
    """Apply a changeset's ``(delta, removed)`` (from
    ``changeset.apply_changeset``) to a COMMITTED tile store in place,
    rewriting only the grid cells whose contents change — the
    incremental-update story the reference declares but never ships
    (/root/reference/src/bin.rs:229-231; round semantics pinned by
    tests/ingest.rs:90-400).

    Plan:

    1. affected cells = cells of delta features (under the store's
       committed bounds) ∪ cells holding a removed key — found via the
       per-tile ``key_min``/``key_max`` zone maps in the manifests,
       confirmed by reading ONLY candidate tiles' key column;
    2. the patched feature set of the affected cells (old − removed
       + delta) re-runs the normal per-cell divide+write; untouched
       cells are never read or written;
    3. if the patch changes the GLOBAL feature bounds the grid itself
       moves, so the whole store is re-optimized (returned as
       ``full_rebuild`` — a rare, inherently global event).

    Because ``write_cell_group`` writes canonical (tile_path, key)
    order, the patched store byte-matches a from-scratch
    ``optimize_to_tiles`` of the final corpus (tested through the
    reference's changeset rounds 0-3).

    Partitioning assumption: the delta is small relative to the store
    (the o5c model) — it is collected to one Arrow table for cell
    assignment; the per-cell rebuild itself is a distributed
    groupby(cell) stage.
    """
    import ray.data as rd

    with open(os.path.join(out_path, "bounds.json")) as f:
        bj = json.load(f)
    bounds = tuple(bj["bounds"])
    grid_divs = tuple(bj["grid_divs"])
    manifests = _read_manifests(out_path)

    if delta is None:
        delta_t = None
    elif isinstance(delta, pa.Table):
        delta_t = delta
    else:
        parts = list(delta.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        delta_t = pa.concat_tables(parts) if parts else None
    if delta_t is not None and len(delta_t) == 0:
        delta_t = None
    if delta_t is not None:
        if augment is not None:
            # store written with optimize_to_tiles(augment=...): stored
            # files carry the derived columns, so the delta must gain
            # them BEFORE schema alignment with the old tiles
            delta_t = augment(delta_t)
        delta_t = assign_grid_cell(delta_t, bounds, grid_divs)

    removed = np.sort(np.asarray(removed_keys, dtype=np.uint64))

    # 1a. cells holding removed keys: zone-map prune, then confirm
    cand_files: dict[int, list[str]] = {}
    for cell, man in manifests.items():
        for t in man["tiles"]:
            kmin, kmax = t.get("key_min"), t.get("key_max")
            if kmin is None:  # pre-zone-map manifest: always candidate
                hit = len(removed) > 0
            else:
                lo = np.searchsorted(removed, np.uint64(kmin), side="left")
                hit = lo < len(removed) and removed[lo] <= np.uint64(kmax)
            if hit:
                cand_files.setdefault(cell, []).append(
                    os.path.join(out_path, "tiles", t["file"])
                )
    hit_cells: set[int] = set()
    for cell, files in cand_files.items():
        for fp in files:
            keys = pq.read_table(fp, columns=["key"]).column("key").to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)
            pos = np.searchsorted(removed, keys)
            pos_c = np.clip(pos, 0, max(len(removed) - 1, 0))
            if len(removed) and bool((removed[pos_c] == keys).any()):
                hit_cells.add(cell)
                break

    delta_cells: set[int] = set()
    if delta_t is not None:
        delta_cells = set(
            int(c)
            for c in np.unique(
                delta_t.column("tile_cell").to_numpy(zero_copy_only=False)
            )
        )
    affected = hit_cells | delta_cells
    if not affected:
        return {"rewritten": [], "removed_cells": [], "full_rebuild": False}

    # 2. patched feature set of the affected cells
    old_files = [
        os.path.join(out_path, "tiles", t["file"])
        for c in sorted(affected & set(manifests))
        for t in manifests[c]["tiles"]
    ]
    parts = []
    if old_files:
        old_ds = rd.read_parquet(old_files)

        def strip_filter(b: pa.Table) -> pa.Table:
            keys = b.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
            if len(removed):
                pos = np.clip(np.searchsorted(removed, keys), 0, len(removed) - 1)
                b = b.filter(pa.array(~(removed[pos] == keys)))
            return b.drop_columns(["tile_path", "tile_depth"])

        parts.append(
            old_ds.map_batches(strip_filter, batch_format="pyarrow", zero_copy_batch=True)
        )
        base_schema = pq.read_schema(old_files[0])
        for c in ("tile_path", "tile_depth"):
            base_schema = base_schema.remove(base_schema.get_field_index(c))
    else:
        base_schema = delta_t.schema
    if delta_t is not None:
        parts.append(rd.from_arrow(delta_t.select(base_schema.names).cast(base_schema)))
    patched = parts[0]
    for p in parts[1:]:
        patched = patched.union(p)
    patched = patched.materialize()

    # 3. bounds check: patched-cell extents ∪ untouched manifest bboxes
    untouched_boxes = [
        t["bbox"]
        for c, man in manifests.items()
        if c not in affected
        for t in man["tiles"]
    ]
    n_patched = patched.count()
    if n_patched == 0 and not untouched_boxes:
        # the patch emptied the ENTIRE store: there are no bounds to
        # compare and nothing to re-optimize — delete tiles+manifests
        # and report the removal instead of entering the full-rebuild
        # path with an empty corpus (whose global_bounds is non-finite)
        import shutil

        shutil.rmtree(os.path.join(out_path, "tiles"), ignore_errors=True)
        shutil.rmtree(_manifest_dir(out_path), ignore_errors=True)
        os.makedirs(os.path.join(out_path, "tiles"), exist_ok=True)
        os.makedirs(_manifest_dir(out_path), exist_ok=True)
        return {
            "rewritten": [],
            "removed_cells": sorted(int(c) for c in affected & set(manifests)),
            "full_rebuild": False,
        }
    box_arr = np.array(untouched_boxes, dtype=np.float32).reshape(-1, 4)
    new_bounds = [
        float(b)
        for b in (
            box_arr[:, 0].min() if len(box_arr) else np.float32(np.inf),
            box_arr[:, 1].min() if len(box_arr) else np.float32(np.inf),
            box_arr[:, 2].max() if len(box_arr) else np.float32(-np.inf),
            box_arr[:, 3].max() if len(box_arr) else np.float32(-np.inf),
        )
    ]
    if n_patched:
        pb = global_bounds(patched)
        new_bounds = [
            min(new_bounds[0], pb[0]),
            min(new_bounds[1], pb[1]),
            max(new_bounds[2], pb[2]),
            max(new_bounds[3], pb[3]),
        ]
    if tuple(np.float32(x) for x in new_bounds) != tuple(np.float32(x) for x in bounds):
        # global event: the grid moves — re-optimize everything
        import shutil

        keep_files = [
            os.path.join(out_path, "tiles", t["file"])
            for c, man in manifests.items()
            if c not in affected
            for t in man["tiles"]
        ]
        all_parts = [patched.map_batches(
            lambda b: b.drop_columns(["tile_cell"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )]
        if keep_files:
            all_parts.append(
                rd.read_parquet(keep_files).map_batches(
                    lambda b: b.drop_columns(list(_TILE_COLS)),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        allf = all_parts[0]
        for p in all_parts[1:]:
            allf = allf.union(p)
        allf = allf.materialize()
        shutil.rmtree(os.path.join(out_path, "tiles"), ignore_errors=True)
        shutil.rmtree(_manifest_dir(out_path), ignore_errors=True)
        optimize_to_tiles(
            allf, out_path, grid_divs=grid_divs, leaf_capacity=leaf_capacity, resume=False
        ).materialize()
        return {
            "rewritten": sorted(set(_read_manifests(out_path))),
            "removed_cells": [],
            "full_rebuild": True,
        }

    # 4. distributed per-cell rewrite (bounds stable → cells keep their
    # committed tile_cell; delta rows were assigned under the same grid)
    man_rows = (
        patched.groupby("tile_cell")
        .map_groups(
            lambda g: write_cell_group(g, out_path, leaf_capacity),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    rewritten = sorted(int(c) for c in man_rows["cell"].unique()) if len(man_rows) else []

    # cells emptied by the patch: drop their manifest + tiles
    removed_cells = sorted(set(int(c) for c in affected) - set(rewritten))
    for c in removed_cells:
        if c not in manifests:
            continue
        mp = os.path.join(_manifest_dir(out_path), f"c{c:05d}.json")
        if os.path.isfile(mp):
            os.remove(mp)
        cdir = os.path.join(out_path, "tiles", f"c{c:05d}")
        if os.path.isdir(cdir):
            import shutil

            shutil.rmtree(cdir)
    # stale tile files a shallower re-divide no longer produces
    new_mans = _read_manifests(out_path)
    for c in rewritten:
        live = {os.path.basename(t["file"]) for t in new_mans[c]["tiles"]}
        cdir = os.path.join(out_path, "tiles", f"c{c:05d}")
        for name in os.listdir(cdir):
            if name.endswith(".parquet") and name not in live:
                os.remove(os.path.join(cdir, name))
    return {
        "rewritten": rewritten,
        "removed_cells": removed_cells,
        "full_rebuild": False,
    }


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
