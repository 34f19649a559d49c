"""Quadtile assignment — the reference's ``optimize`` pass
(/root/reference/src/lib.rs:408-602 + src/divide.rs) as Dataset stages.

Pipeline:

1. global f32 bounds — ``ds.aggregate(Min/Max)`` (A2,
   src/lib.rs:413-425);
2. grid owner cell per feature (T1/T2, src/lib.rs:427-444): the
   reference *queries* each grid cell and dedups boundary-straddling
   features through a shared skip map (racy — src/lib.rs:446,470-515);
   we assign each feature to exactly ONE owner cell (max overlap area,
   ties → lowest row-major index) so dedup holds by construction
   (SURVEY.md §2.5 O3) and no cross-worker state exists;
3. per-cell quad divide (T3, src/divide.rs:9-72) — semantics
   reproduced exactly: f32 child-box arithmetic, largest-overlap child
   with first-wins ties and the (0.0, 0) init, the ≤n leaf rule, the
   all-features-of-parent + all_big rule, DEPTH_LIMIT 30, leaf
   capacity 50k (src/lib.rs:526);
4. the per-cell group runs as ``groupby(cell).map_groups`` over Arrow
   batches — one vectorized BFS per cell, no per-feature Python in the
   overlap math.

Tile key encoding: ``tile_cell`` (int32 grid index) +
``tile_path`` (int64, sentinel-prefixed quad path: 1 at bit 2·depth,
two bits per level, root = 1).

Degenerate zero-extent interval features reproduce the reference's
behavior inside divide (all overlaps 0.0 → child 0 — divide.rs:44-51);
at the *grid* level (where the reference is nondeterministic) they are
assigned by bbox center, documented divergence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEPTH_LIMIT = 30  # src/divide.rs:10
LEAF_CAPACITY = 50_000  # src/lib.rs:526


# --------------------------------------------------------------------------
# global bounds (A2)
# --------------------------------------------------------------------------


def global_bounds(features_ds) -> tuple[float, float, float, float]:
    """f32 dataset bounds — src/lib.rs:413-425 fold."""
    from ray.data.aggregate import Max, Min

    row = features_ds.aggregate(
        Min("minx", alias_name="minx"),
        Min("miny", alias_name="miny"),
        Max("maxx", alias_name="maxx"),
        Max("maxy", alias_name="maxy"),
    )
    return (
        float(np.float32(row["minx"])),
        float(np.float32(row["miny"])),
        float(np.float32(row["maxx"])),
        float(np.float32(row["maxy"])),
    )


# --------------------------------------------------------------------------
# grid owner assignment (T1 + O3)
# --------------------------------------------------------------------------


def _grid_edges(lo: float, hi: float, divs: int) -> np.ndarray:
    """Cell edges with the reference's f32 formula
    ``(i/divs) * span + lo`` (src/lib.rs:427-444)."""
    f32 = np.float32
    span = f32(hi) - f32(lo)
    i = np.arange(divs + 1, dtype=np.float32)
    return (i / f32(divs)) * span + f32(lo)


def assign_grid_cell(
    batch: pa.Table,
    bounds: tuple[float, float, float, float],
    divs: tuple[int, int],
) -> pa.Table:
    """Owner grid cell per feature → append ``tile_cell`` int32.

    Max-overlap along x and y independently (the 2-D argmax of the
    product factorizes), ties to the lowest index; degenerate
    zero-extent axes fall back to the center cell.
    """
    x_divs, y_divs = divs
    ex = _grid_edges(bounds[0], bounds[2], x_divs)
    ey = _grid_edges(bounds[1], bounds[3], y_divs)
    minx = batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float32)
    miny = batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float32)
    maxx = batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float32)
    maxy = batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float32)

    ix = _axis_owner(minx, maxx, ex)
    iy = _axis_owner(miny, maxy, ey)
    cell = (iy * x_divs + ix).astype(np.int32)
    return batch.append_column("tile_cell", pa.array(cell, pa.int32()))


def _axis_owner(lo: np.ndarray, hi: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Index of the cell with max 1-D overlap (ties → lowest index)."""
    divs = len(edges) - 1
    # candidate range from searchsorted (edges are monotone f32)
    i0 = np.clip(np.searchsorted(edges, lo, side="right") - 1, 0, divs - 1)
    i1 = np.clip(np.searchsorted(edges, hi, side="left") - 1, i0, divs - 1)
    center = (lo + hi) * np.float32(0.5)
    ic = np.clip(np.searchsorted(edges, center, side="right") - 1, 0, divs - 1)

    best = i0.copy()
    best_ov = np.minimum(hi, edges[i0 + 1]) - np.maximum(lo, edges[i0])
    # a feature spans at most a few candidate cells in the common case;
    # interior cells all tie at full width, so checking i0, i0+1 and the
    # first interior cell covers the argmax (ties resolve to lowest).
    for off in range(1, 9):
        cand = i0 + off
        ok = cand <= i1
        if not ok.any():
            break
        c = np.where(ok, cand, i0)
        ov = np.minimum(hi, edges[c + 1]) - np.maximum(lo, edges[c])
        better = ok & (ov > best_ov)
        best = np.where(better, c, best)
        best_ov = np.where(better, ov, best_ov)
    # features wider than 8 cells: all interior cells tie at full width
    # modulo 1-ulp f32 edge rounding; the first interior cell (already
    # checked) is the deterministic owner.
    degenerate = best_ov <= 0
    return np.where(degenerate, ic, best).astype(np.int64)


# --------------------------------------------------------------------------
# quad divide (T3) — exact src/divide.rs semantics, vectorized BFS
# --------------------------------------------------------------------------


def quad_divide(
    bbox: tuple[float, float, float, float],
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    is_point: np.ndarray,
    n: int = LEAF_CAPACITY,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature quadtile path within one bucket.

    Returns (path int64 sentinel-prefixed, depth int8). Reproduces
    /root/reference/src/divide.rs:9-72: BFS queue, 2×2 f32 midpoint
    split, largest-overlap child (strict ``>`` scan from (0.0, 0)),
    leaf when ≤n, the count==parent + all_big rule, depth cap 30.
    """
    f32 = np.float32
    count = len(minx)
    path = np.ones(count, dtype=np.int64)  # sentinel-only = root leaf
    depth = np.zeros(count, dtype=np.int8)
    if count <= n:
        return path, depth

    minx = minx.astype(f32, copy=False)
    miny = miny.astype(f32, copy=False)
    maxx = maxx.astype(f32, copy=False)
    maxy = maxy.astype(f32, copy=False)

    from collections import deque

    queue = deque()
    queue.append((0, bbox, np.arange(count)))
    while queue:
        d, (qx0, qy0, qx1, qy1), idx = queue.popleft()
        if len(idx) == 0:
            continue
        qx0, qy0, qx1, qy1 = f32(qx0), f32(qy0), f32(qx1), f32(qy1)
        span_x = qx1 - qx0
        span_y = qy1 - qy0
        # child boxes, row-major iy→ix (divide.rs:26-39), f32 arithmetic
        boxes = []
        for iy in range(2):
            for ix in range(2):
                bx0 = (f32(ix) / f32(2)) * span_x + qx0
                by0 = (f32(iy) / f32(2)) * span_y + qy0
                bx1 = ((f32(ix) + f32(1)) / f32(2)) * span_x + qx0
                by1 = ((f32(iy) + f32(1)) / f32(2)) * span_y + qy0
                boxes.append((bx0, by0, bx1, by1))

        sub_minx, sub_miny = minx[idx], miny[idx]
        sub_maxx, sub_maxy = maxx[idx], maxy[idx]
        sub_pt = is_point[idx]
        areas = np.zeros((len(idx), 4), dtype=np.float32)
        for j, (bx0, by0, bx1, by1) in enumerate(boxes):
            pt_in = (bx0 <= sub_minx) & (sub_minx <= bx1) & (by0 <= sub_miny) & (sub_miny <= by1)
            disjoint = (bx0 > sub_maxx) | (bx1 < sub_minx) | (by0 > sub_maxy) | (by1 < sub_miny)
            ox = np.minimum(sub_maxx, bx1) - np.maximum(sub_minx, bx0)
            oy = np.minimum(sub_maxy, by1) - np.maximum(sub_miny, by0)
            a = (ox * oy).astype(np.float32)
            a = np.where(disjoint, f32(0), a)
            areas[:, j] = np.where(sub_pt, np.where(pt_in, f32(1), f32(0)), a)
        # strict > scan from (0.0, 0) == first-max argmax (divide.rs:44-51)
        best = np.argmax(areas, axis=1)

        parent_len = len(idx)
        for j in range(4):
            sel = idx[best == j]
            if len(sel) == 0:
                continue
            # record this step in the path
            path[sel] = (path[sel] << 2) | j
            depth[sel] = d + 1
            if len(sel) <= n:
                continue  # leaf (divide.rs:54-55)
            if len(sel) == parent_len:
                big = (~is_point[sel]) & (
                    ((maxx[sel] - minx[sel]) > span_x) | ((maxy[sel] - miny[sel]) > span_y)
                )
                if big.all() or d + 1 >= DEPTH_LIMIT:
                    continue  # leaf (divide.rs:56-61)
                queue.append((d + 1, boxes[j], sel))
            elif d + 1 >= DEPTH_LIMIT:
                continue  # leaf (divide.rs:64)
            else:
                queue.append((d + 1, boxes[j], sel))
    return path, depth


def divide_cell_group(
    group: pa.Table, n: int = LEAF_CAPACITY
) -> pa.Table:
    """map_groups body: one grid cell's features → + tile_path/tile_depth.

    The divide bbox is the union of the cell's *feature* bounds (not
    the grid cell bbox) — matching the reference's q_bbox fold
    (src/lib.rs:516-519)."""
    minx = group.column("minx").to_numpy(zero_copy_only=False).astype(np.float32)
    miny = group.column("miny").to_numpy(zero_copy_only=False).astype(np.float32)
    maxx = group.column("maxx").to_numpy(zero_copy_only=False).astype(np.float32)
    maxy = group.column("maxy").to_numpy(zero_copy_only=False).astype(np.float32)
    kind = group.column("kind").to_numpy(zero_copy_only=False)
    is_point = kind == 1
    bbox = (minx.min(), miny.min(), maxx.max(), maxy.max())
    path, depth = quad_divide(bbox, minx, miny, maxx, maxy, is_point, n)
    out = group.append_column("tile_path", pa.array(path, pa.int64()))
    return out.append_column("tile_depth", pa.array(depth, pa.int8()))


# --------------------------------------------------------------------------
# dataset-level assignment
# --------------------------------------------------------------------------


def coalesce_blocks(ds, rows_per_block: int = 65_536):
    """Merge fragmented blocks before a wide op.

    The union of three encode branches leaves hundreds of ~1k-row
    blocks; per-block fixed costs then dominate any shuffle (measured:
    a 64-group groupby over 335 blocks cost 15.5s vs 1.1s after
    coalescing to 32). Round-robin repartition is a cheap exchange —
    no keys, no sort."""
    try:
        from .util import cluster_cpus

        n_rows = ds.count()
        target = max(cluster_cpus(), -(-n_rows // rows_per_block))
        if ds.num_blocks() > 2 * target:
            return ds.repartition(target)
    except Exception:
        pass
    return ds


def assign_tiles(
    features_ds,
    grid_divs: tuple[int, int] = (8, 8),
    leaf_capacity: int = LEAF_CAPACITY,
    bounds: tuple[float, float, float, float] | None = None,
):
    """features → features + (tile_cell, tile_path, tile_depth).

    One aggregate pass for bounds, one map for owner cells, one
    groupby(cell) shuffle for the per-cell divide. The groupby key is
    the owner cell — every feature lands in exactly one tile
    (partition property, tested), so the reference's cross-worker skip
    map (ST5) is eliminated.

    When bounds are not supplied the features Dataset is materialized
    first: the bounds aggregate and the tile shuffle would otherwise
    each re-execute the whole upstream DAG (parse+joins+encode twice).
    Features are far smaller than the input corpus and are about to be
    shuffled anyway; the object store spills if needed.
    """
    if bounds is None:
        features_ds = features_ds.materialize()
        bounds = global_bounds(features_ds)
    features_ds = coalesce_blocks(features_ds)

    with_cell = features_ds.map_batches(
        lambda b: assign_grid_cell(b, bounds, grid_divs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return with_cell.groupby("tile_cell").map_groups(
        lambda g: divide_cell_group(g, leaf_capacity),
        batch_format="pyarrow",
    )


def tile_key_strings(cell: np.ndarray, path: np.ndarray) -> list[str]:
    """Human-readable tile ids, e.g. ``c042/p1f3`` (hex path w/ sentinel)."""
    return [f"c{c:03d}/p{p:x}" for c, p in zip(cell, path)]
