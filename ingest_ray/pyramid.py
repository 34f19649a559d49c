"""Zoom pyramid over a tile store — per-zoom geometry reduction.

A renderer at zoom ``z`` resolves ~``360 / (256·2^z)`` degrees per
pixel; storing full-resolution georender features at every zoom wastes
both tile bytes and render time. Each pyramid level applies, per
feature (one shuffle-free ``map_batches`` pass + the standard tiling
shuffle):

* **sub-pixel drop** — non-point features whose bbox extent is under
  one pixel at this zoom disappear entirely;
* **line simplification** — RDP (:mod:`.simplify`) at one-pixel eps;
* **ring-aware area simplification** — every ring (outer + holes)
  simplified independently via the feature's pair ``ring_offsets``;
  rings reduced below 3 vertices are dropped, features whose OUTER
  ring dies are dropped, and surviving rings are re-triangulated with
  the same earcut the base encoder uses, so ``cells`` stays a valid
  triangulation of the simplified geometry;
* **bbox recompute** from the simplified positions;
* re-tiling through :func:`ingest_ray.checkpoint.optimize_to_tiles` —
  fewer/smaller features per level naturally produce coarser quadtile
  leaves, which is exactly the per-zoom tile layout a renderer wants.

The full-resolution ``payload`` (georender bytes) stays in the BASE
store only; pyramid levels carry the decoded columns (positions /
ring_offsets / cells / labels) a renderer consumes directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geom import bbox_reduceat, earcut
from .simplify import dp_keep_mask


def pixel_eps(zoom: int, *, world: float = 360.0, tile_px: int = 256) -> float:
    """Degrees per pixel at ``zoom`` (256-px quadtiles over ``world``)."""
    return world / (tile_px * (1 << zoom))


def simplify_features_batch(batch: pa.Table, eps: float) -> pa.Table:
    """One feature batch → simplified rows (some dropped)."""
    kind = batch.column("kind").to_numpy(zero_copy_only=False)
    minx = batch.column("minx").to_numpy(zero_copy_only=False)
    miny = batch.column("miny").to_numpy(zero_copy_only=False)
    maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
    maxy = batch.column("maxy").to_numpy(zero_copy_only=False)

    pos = batch.column("positions")
    if isinstance(pos, pa.ChunkedArray):
        pos = pos.combine_chunks()
    poff = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    pflat = pos.values.to_numpy(zero_copy_only=False)
    roff_col = batch.column("ring_offsets")
    if isinstance(roff_col, pa.ChunkedArray):
        roff_col = roff_col.combine_chunks()
    ro_off = roff_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    ro_flat = roff_col.values.to_numpy(zero_copy_only=False).astype(np.int64)

    # sub-pixel drop (points always survive)
    visible = (kind == 1) | (
        np.maximum(maxx - minx, maxy - miny).astype(np.float64) >= eps
    )

    keep_rows: list[int] = []
    new_pos: list[np.ndarray] = []
    new_roffs: list[np.ndarray] = []
    new_cells: list[np.ndarray] = []
    for i in np.flatnonzero(visible):
        seg = pflat[poff[i] : poff[i + 1]]
        if kind[i] == 1:  # point: untouched
            keep_rows.append(i)
            new_pos.append(seg)
            new_roffs.append(ro_flat[ro_off[i] : ro_off[i + 1]])
            new_cells.append(np.empty(0, dtype=np.int64))
            continue
        x, y = seg[0::2].astype(np.float64), seg[1::2].astype(np.float64)
        if kind[i] == 2:  # line
            m = dp_keep_mask(x, y, eps)
            if m.sum() < 2:
                continue
            keep_rows.append(i)
            new_pos.append(seg[np.repeat(m, 2)])
            new_roffs.append(np.array([0, int(m.sum())], dtype=np.int64))
            new_cells.append(np.empty(0, dtype=np.int64))
            continue
        # area: per-ring simplify via the feature's pair offsets
        rofs = ro_flat[ro_off[i] : ro_off[i + 1]]
        rings: list[np.ndarray] = []
        outer_alive = False
        for r in range(len(rofs) - 1):
            s, e = int(rofs[r]), int(rofs[r + 1])
            m = dp_keep_mask(x[s:e], y[s:e], eps)
            if m.sum() >= 3:
                rings.append(np.flatnonzero(m) + s)
                if r == 0:
                    outer_alive = True
            elif r == 0:
                break
        if not outer_alive:
            continue
        ring_lens = np.array([len(r) for r in rings], dtype=np.int64)
        vidx = np.concatenate(rings)
        data = np.empty(2 * len(vidx), dtype=np.float64)
        data[0::2] = x[vidx]
        data[1::2] = y[vidx]
        holes = np.cumsum(ring_lens)[:-1].tolist() if len(rings) > 1 else None
        tris = earcut(data.tolist(), holes)
        if not tris:
            continue
        keep_rows.append(i)
        pos_i = np.empty(2 * len(vidx), dtype=pflat.dtype)
        pos_i[0::2] = seg[0::2][vidx]
        pos_i[1::2] = seg[1::2][vidx]
        new_pos.append(pos_i)
        new_roffs.append(np.concatenate([[0], np.cumsum(ring_lens)]))
        new_cells.append(np.asarray(tris, dtype=np.int64))

    if not keep_rows:
        return _out_table(batch, [], [], [], [])
    return _out_table(batch, keep_rows, new_pos, new_roffs, new_cells)


def _out_table(batch, rows, new_pos, new_roffs, new_cells) -> pa.Table:
    take = pa.array(np.asarray(rows, dtype=np.int64), pa.int64())
    # tile_* columns from a base-store read are stale after re-tiling
    drop = {
        "positions", "ring_offsets", "cells", "payload",
        "minx", "miny", "maxx", "maxy",
        "tile_cell", "tile_path", "tile_depth",
    }
    base = batch.select([c for c in batch.column_names if c not in drop]).take(take)
    n = len(rows)
    pos_lens = np.array([len(p) for p in new_pos], dtype=np.int64)
    pos_flat = np.concatenate(new_pos) if n else np.empty(0, dtype=np.float32)
    pos_offs = np.concatenate([[0], np.cumsum(pos_lens)])
    bbox = bbox_reduceat(
        pos_flat.astype(np.float32), (pos_offs // 2).astype(np.int64)
    ) if n else np.empty((0, 4), dtype=np.float32)
    roff_lens = np.array([len(r) for r in new_roffs], dtype=np.int64)
    roff_flat = (
        np.concatenate(new_roffs) if n else np.empty(0, dtype=np.int64)
    )
    cell_lens = np.array([len(c) for c in new_cells], dtype=np.int64)
    cell_flat = np.concatenate(new_cells) if n else np.empty(0, dtype=np.int64)
    cols = {c: base.column(c) for c in base.column_names}
    cols["minx"] = pa.array(bbox[:, 0] if n else [], pa.float32())
    cols["miny"] = pa.array(bbox[:, 1] if n else [], pa.float32())
    cols["maxx"] = pa.array(bbox[:, 2] if n else [], pa.float32())
    cols["maxy"] = pa.array(bbox[:, 3] if n else [], pa.float32())
    cols["positions"] = pa.ListArray.from_arrays(
        pa.array(pos_offs.astype(np.int32), pa.int32()),
        pa.array(pos_flat.astype(np.float32), pa.float32()),
    )
    cols["ring_offsets"] = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(roff_lens)]).astype(np.int32), pa.int32()),
        pa.array(roff_flat.astype(np.int32), pa.int32()),
    )
    cols["cells"] = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cell_lens)]).astype(np.int32), pa.int32()),
        pa.array(cell_flat.astype(np.int32), pa.int32()),
    )
    return pa.table(cols)


def build_zoom_level(features_ds, out_dir: str, *, zoom: int, grid_divs=(8, 8), leaf_capacity: int = 2048):
    """One pyramid level: simplify at this zoom's pixel eps, re-tile,
    write a committed store under ``out_dir`` (same manifest layout as
    the base store — resumable/patchable with the same tools)."""
    from .checkpoint import optimize_to_tiles

    eps = pixel_eps(zoom)

    def fn(batch: pa.Table) -> pa.Table:
        return simplify_features_batch(batch, eps)

    simplified = features_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return optimize_to_tiles(
        simplified, out_dir, grid_divs=grid_divs, leaf_capacity=leaf_capacity, resume=False
    )


def build_zoom_pyramid(store_dir: str, *, zooms: tuple[int, ...] = (2, 4, 6), **kw):
    """Read the committed base store and write one level per zoom under
    ``store_dir/zoom/z{z}``. Returns {zoom: manifest Dataset}."""
    import os

    from .checkpoint import read_tiles

    out = {}
    for z in zooms:
        feats = read_tiles(store_dir)
        zdir = os.path.join(store_dir, "zoom", f"z{z}")
        out[z] = build_zoom_level(feats, zdir, zoom=z, **kw)
    return out
