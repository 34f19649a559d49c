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
    """f32 dataset bounds — src/lib.rs:413-425 fold.

    On a MATERIALIZED dataset this is a flat task sweep over the
    plasma block refs (zero-copy reads, one tiny task per block, no
    Dataset-execution ramp — the same shape as the zone-map index
    build); a lazy dataset falls back to the aggregate."""
    import ray
    from ray.data.dataset import MaterializedDataset

    if isinstance(features_ds, MaterializedDataset):

        @ray.remote(num_cpus=0.25)
        def block_bounds(*tbls):
            lo = (np.inf, np.inf)
            hi = (-np.inf, -np.inf)
            for tbl in tbls:
                if len(tbl) == 0:
                    continue
                lo = (
                    min(lo[0], float(tbl.column("minx").to_numpy(zero_copy_only=False).min())),
                    min(lo[1], float(tbl.column("miny").to_numpy(zero_copy_only=False).min())),
                )
                hi = (
                    max(hi[0], float(tbl.column("maxx").to_numpy(zero_copy_only=False).max())),
                    max(hi[1], float(tbl.column("maxy").to_numpy(zero_copy_only=False).max())),
                )
            return (lo[0], lo[1], hi[0], hi[1])

        refs = features_ds.to_arrow_refs()
        # chunk refs so dispatch is O(64) tasks even over a fragmented
        # block list (714 one-block tasks measured 6.8 s of pure
        # submission latency)
        step = max(1, -(-len(refs) // 64))
        parts = ray.get(
            [block_bounds.remote(*refs[i : i + step]) for i in range(0, len(refs), step)]
        )
        if parts:
            arr = np.array(parts, dtype=np.float64)
            return (
                float(np.float32(arr[:, 0].min())),
                float(np.float32(arr[:, 1].min())),
                float(np.float32(arr[:, 2].max())),
                float(np.float32(arr[:, 3].max())),
            )

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
    # materialize on BOTH paths before coalesce_blocks: it inspects
    # count()/num_blocks(), which on a lazy Dataset executes the whole
    # upstream DAG once and the downstream shuffle a second time — a
    # silent 2x recompute when explicit bounds skip the aggregate
    features_ds = features_ds.materialize()
    if bounds is None:
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


# --------------------------------------------------------------------------
# aggregated (skew-proof) quad divide — exact T3 without cell colocation
# --------------------------------------------------------------------------
#
# quad_divide needs every feature of a grid cell in one task, so a hot
# cell (dense city) is a straggler and a memory cliff. But the divide
# has exactly ONE inter-feature dependency: WHERE TO STOP (the ≤n leaf
# rule / the count==parent ∧ all_big rule). The child a feature
# descends into at each level is a pure f32 function of (cell bbox,
# its own bbox). So:
#
#   pass 1  map: per-cell bbox partials                (tiny reduce)
#   pass 2  map: per-feature FULL 30-level path + per-level "big" bits;
#           partial-aggregate (cell, path30) → (count, AND big)  —
#           only compact count keys ever leave a worker
#   reduce: walk each cell's prefix-count tree top-down applying the
#           reference's stop rules → (path30 → final path, depth)
#   pass 3  map: truncate every feature's path via the broadcast table
#
# Identical output to quad_divide (property-tested), no feature
# shuffle at all, and hot cells cost the same as cold ones. The reduce
# runs as a distributed groupby(cell) stage over compact
# (cell, path30, count, bigand) keys — a per-cell tree of
# ≤ count/n · 4/3 keys; only the final stop tables reach the driver.


def full_quad_paths(
    qx0: np.ndarray,
    qy0: np.ndarray,
    qx1: np.ndarray,
    qy1: np.ndarray,
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    is_point: np.ndarray,
    depth_limit: int = DEPTH_LIMIT,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature full-depth quad path (no stop rules applied).

    Inputs are f32-able arrays; ``qx0..qy1`` is each feature's cell
    bbox. Returns (path30 uint64 — 2 bits per level, level 1 at the
    high end — and bigmask uint64 — bit d set iff the feature is
    "big" w.r.t. its depth-d node's span, divide.rs:57-59).
    """
    f32 = np.float32
    n = len(minx)
    qx0 = qx0.astype(f32, copy=True)
    qy0 = qy0.astype(f32, copy=True)
    qx1 = qx1.astype(f32, copy=True)
    qy1 = qy1.astype(f32, copy=True)
    minx = minx.astype(f32, copy=False)
    miny = miny.astype(f32, copy=False)
    maxx = maxx.astype(f32, copy=False)
    maxy = maxy.astype(f32, copy=False)
    w = maxx - minx
    h = maxy - miny
    path = np.zeros(n, dtype=np.uint64)
    bigmask = np.zeros(n, dtype=np.uint64)
    two = f32(2)
    for d in range(depth_limit):
        span_x = qx1 - qx0
        span_y = qy1 - qy0
        big = (~is_point) & ((w > span_x) | (h > span_y))
        bigmask |= big.astype(np.uint64) << np.uint64(d)
        best = np.zeros(n, dtype=np.int64)
        best_area = np.full(n, f32(0), dtype=f32)
        for j in range(4):
            ix, iy = f32(j % 2), f32(j // 2)
            bx0 = (ix / two) * span_x + qx0
            by0 = (iy / two) * span_y + qy0
            bx1 = ((ix + f32(1)) / two) * span_x + qx0
            by1 = ((iy + f32(1)) / two) * span_y + qy0
            pt_in = (bx0 <= minx) & (minx <= bx1) & (by0 <= miny) & (miny <= by1)
            disjoint = (bx0 > maxx) | (bx1 < minx) | (by0 > maxy) | (by1 < miny)
            ox = np.minimum(maxx, bx1) - np.maximum(minx, bx0)
            oy = np.minimum(maxy, by1) - np.maximum(miny, by0)
            a = np.where(disjoint, f32(0), (ox * oy).astype(f32))
            a = np.where(is_point, np.where(pt_in, f32(1), f32(0)), a)
            better = a > best_area  # strict >: first max wins (divide.rs:44-51)
            best = np.where(better, j, best)
            best_area = np.where(better, a, best_area)
        path = (path << np.uint64(2)) | best.astype(np.uint64)
        bix = (best % 2).astype(f32)
        biy = (best // 2).astype(f32)
        nqx0 = (bix / two) * span_x + qx0
        nqy0 = (biy / two) * span_y + qy0
        qx1 = ((bix + f32(1)) / two) * span_x + qx0
        qy1 = ((biy + f32(1)) / two) * span_y + qy0
        qx0, qy0 = nqx0, nqy0
    return path, bigmask


def _stop_table(
    keys: np.ndarray, counts: np.ndarray, bigmasks: np.ndarray, total: int, n: int,
    depth_limit: int = DEPTH_LIMIT,
) -> tuple[np.ndarray, np.ndarray]:
    """One cell's prefix-tree walk → per-key (final path, depth).

    ``keys`` are the cell's distinct path30 values, SORTED ascending;
    ``counts``/``bigmasks`` their aggregated feature count / per-level
    big AND. Applies quad_divide's stop rules exactly.
    """
    K = len(keys)
    stop = np.full(K, -1, dtype=np.int64)
    if total <= n:
        stop[:] = 0
    cnt_prev = np.full(K, total, dtype=np.int64)
    for d in range(1, depth_limit + 1):
        act = stop < 0
        if not act.any():
            break
        prefix = keys >> np.uint64(2 * (depth_limit - d))
        newg = np.concatenate([[True], prefix[1:] != prefix[:-1]])
        starts = np.flatnonzero(newg)
        gsizes = np.diff(np.concatenate([starts, [K]]))
        cnt_g = np.add.reduceat(counts, starts)
        big_g = np.bitwise_and.reduceat(bigmasks, starts)
        cnt_d = np.repeat(cnt_g, gsizes)
        big_d = np.repeat(big_g, gsizes)
        all_big = (big_d >> np.uint64(d - 1)) & np.uint64(1)
        leaf = (
            (cnt_d <= n)
            | ((cnt_d == cnt_prev) & (all_big == 1))
            | (d >= depth_limit)
        )
        stop = np.where(act & leaf, d, stop)
        cnt_prev = cnt_d
    stop = np.where(stop < 0, depth_limit, stop)
    su = stop.astype(np.uint64)
    out_path = (np.uint64(1) << (np.uint64(2) * su)) | (
        keys >> (np.uint64(2) * np.uint64(depth_limit) - np.uint64(2) * su)
    )
    return out_path.astype(np.int64), stop.astype(np.int8)


def assign_tiles_aggregated(
    features_ds,
    grid_divs: tuple[int, int] = (8, 8),
    leaf_capacity: int = LEAF_CAPACITY,
    bounds: tuple[float, float, float, float] | None = None,
):
    """Skew-proof tile assignment: same output as :func:`assign_tiles`
    (property-tested), zero feature shuffles."""
    import pyarrow as pa
    import ray

    features_ds = features_ds.materialize()  # see assign_tiles: coalesce
    # inspects count()/num_blocks(); lazy input would recompute twice
    if bounds is None:
        bounds = global_bounds(features_ds)
    features_ds = coalesce_blocks(features_ds).materialize()

    with_cell = features_ds.map_batches(
        lambda b: assign_grid_cell(b, bounds, grid_divs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # pass 1: per-cell feature-bounds union (quad bbox = q_bbox fold,
    # src/lib.rs:516-519) — partial per batch, distributed combine
    def cell_bbox_partial(b: pa.Table) -> pa.Table:
        cell = b.column("tile_cell").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        out = {
            "cell": pa.array(cs[starts], pa.int32()),
            "minx": pa.array(np.minimum.reduceat(b.column("minx").to_numpy(zero_copy_only=False)[order], starts), pa.float32()),
            "miny": pa.array(np.minimum.reduceat(b.column("miny").to_numpy(zero_copy_only=False)[order], starts), pa.float32()),
            "maxx": pa.array(np.maximum.reduceat(b.column("maxx").to_numpy(zero_copy_only=False)[order], starts), pa.float32()),
            "maxy": pa.array(np.maximum.reduceat(b.column("maxy").to_numpy(zero_copy_only=False)[order], starts), pa.float32()),
            "n": pa.array(np.diff(np.concatenate([starts, [len(cs)]])), pa.int64()),
        }
        return pa.table(out)

    # combine the per-batch partials DISTRIBUTED (groupby(cell)
    # aggregate): the driver receives exactly one row per grid cell —
    # O(cells), independent of block count (the partial table itself
    # is O(blocks × cells))
    from ray.data.aggregate import Max, Min, Sum

    combined = (
        with_cell.map_batches(cell_bbox_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(
            Min("minx", alias_name="minx"),
            Min("miny", alias_name="miny"),
            Max("maxx", alias_name="maxx"),
            Max("maxy", alias_name="maxy"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    cell_bbox = {
        int(r["cell"]): (
            np.float32(r["minx"]),
            np.float32(r["miny"]),
            np.float32(r["maxx"]),
            np.float32(r["maxy"]),
            int(r["n"]),
        )
        for _, r in combined.iterrows()
    }
    bbox_ref = ray.put(cell_bbox)

    # pass 2: full paths + per-(cell, path30) partial aggregation
    def paths_partial(b: pa.Table) -> pa.Table:
        cb = ray.get(bbox_ref)
        cell = b.column("tile_cell").to_numpy(zero_copy_only=False)
        minx = b.column("minx").to_numpy(zero_copy_only=False)
        miny = b.column("miny").to_numpy(zero_copy_only=False)
        maxx = b.column("maxx").to_numpy(zero_copy_only=False)
        maxy = b.column("maxy").to_numpy(zero_copy_only=False)
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        qx0 = np.empty(len(b), dtype=np.float32)
        qy0 = np.empty(len(b), dtype=np.float32)
        qx1 = np.empty(len(b), dtype=np.float32)
        qy1 = np.empty(len(b), dtype=np.float32)
        for c in np.unique(cell):
            m = cell == c
            bx = cb[int(c)]
            qx0[m], qy0[m], qx1[m], qy1[m] = bx[0], bx[1], bx[2], bx[3]
        path30, bigmask = full_quad_paths(
            qx0, qy0, qx1, qy1, minx, miny, maxx, maxy, kind == 1
        )
        order = np.lexsort((path30, cell))
        cs, ps, bs = cell[order], path30[order], bigmask[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (cs[1:] != cs[:-1]) | (ps[1:] != ps[:-1])])
        )
        return pa.table(
            {
                "cell": pa.array(cs[starts], pa.int32()),
                "path30": pa.array(ps[starts], pa.uint64()),
                "count": pa.array(
                    np.diff(np.concatenate([starts, [len(cs)]])), pa.int64()
                ),
                "bigand": pa.array(np.bitwise_and.reduceat(bs, starts), pa.uint64()),
            }
        )

    # reduce: per-cell combine + stop-tree walk as a DISTRIBUTED
    # groupby(cell) stage — only compact (cell, path30, count, bigand)
    # keys shuffle, and the driver collects nothing but the final stop
    # tables (one row per distinct kept path; strictly smaller than the
    # pass-2 partials it previously pulled with iter_batches)
    import pandas as pd

    def cell_walk(df: pd.DataFrame) -> pa.Table:
        cb = ray.get(bbox_ref)
        paths_a = df["path30"].to_numpy().astype(np.uint64)
        counts_a = df["count"].to_numpy().astype(np.int64)
        bigs_a = df["bigand"].to_numpy().astype(np.uint64)
        c = int(df["cell"].iloc[0])
        order = np.argsort(paths_a, kind="stable")
        ps, cs_, bs = paths_a[order], counts_a[order], bigs_a[order]
        starts = np.flatnonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))
        u_path = ps[starts]
        u_cnt = np.add.reduceat(cs_, starts)
        u_big = np.bitwise_and.reduceat(bs, starts)
        fp, dep = _stop_table(u_path, u_cnt, u_big, cb[c][4], leaf_capacity)
        return pa.table(
            {
                "cell": pa.array(np.full(len(u_path), c, dtype=np.int32), pa.int32()),
                "path30": pa.array(u_path, pa.uint64()),
                "fin": pa.array(fp.astype(np.int64), pa.int64()),
                "dep": pa.array(dep.astype(np.int8), pa.int8()),
            }
        )

    stop_rows = pa.concat_tables(
        list(
            with_cell.map_batches(paths_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("cell")
            .map_groups(cell_walk, batch_format="pandas")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 22)
        )
    )
    sr_cell = stop_rows.column("cell").to_numpy(zero_copy_only=False)
    sr_path = stop_rows.column("path30").to_numpy(zero_copy_only=False)
    sr_fin = stop_rows.column("fin").to_numpy(zero_copy_only=False)
    sr_dep = stop_rows.column("dep").to_numpy(zero_copy_only=False)
    order = np.lexsort((sr_path, sr_cell))
    sr_cell, sr_path, sr_fin, sr_dep = (
        sr_cell[order], sr_path[order], sr_fin[order], sr_dep[order]
    )
    stop_tables: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    cell_starts = np.flatnonzero(np.concatenate([[True], sr_cell[1:] != sr_cell[:-1]]))
    cell_ends = np.concatenate([cell_starts[1:], [len(sr_cell)]])
    for s, e in zip(cell_starts, cell_ends):
        stop_tables[int(sr_cell[s])] = (sr_path[s:e], sr_fin[s:e], sr_dep[s:e])
    stop_ref = ray.put(stop_tables)

    # pass 3: truncate each feature's path via the broadcast stop table
    def finalize(b: pa.Table) -> pa.Table:
        st = ray.get(stop_ref)
        cb = ray.get(bbox_ref)
        cell = b.column("tile_cell").to_numpy(zero_copy_only=False)
        minx = b.column("minx").to_numpy(zero_copy_only=False)
        miny = b.column("miny").to_numpy(zero_copy_only=False)
        maxx = b.column("maxx").to_numpy(zero_copy_only=False)
        maxy = b.column("maxy").to_numpy(zero_copy_only=False)
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        qx0 = np.empty(len(b), dtype=np.float32)
        qy0 = np.empty(len(b), dtype=np.float32)
        qx1 = np.empty(len(b), dtype=np.float32)
        qy1 = np.empty(len(b), dtype=np.float32)
        for c in np.unique(cell):
            m = cell == c
            bx = cb[int(c)]
            qx0[m], qy0[m], qx1[m], qy1[m] = bx[0], bx[1], bx[2], bx[3]
        path30, _ = full_quad_paths(qx0, qy0, qx1, qy1, minx, miny, maxx, maxy, kind == 1)
        out_path = np.empty(len(b), dtype=np.int64)
        out_depth = np.empty(len(b), dtype=np.int8)
        for c in np.unique(cell):
            m = cell == c
            keys, fp, dep = st[int(c)]
            pos = np.searchsorted(keys, path30[m])
            out_path[m] = fp[pos]
            out_depth[m] = dep[pos]
        out = b.append_column("tile_path", pa.array(out_path, pa.int64()))
        return out.append_column("tile_depth", pa.array(out_depth, pa.int8()))

    return with_cell.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
