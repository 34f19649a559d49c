"""Grid-density spatial clustering: connected components over occupied
grid cells (the scalable skeleton of DBSCAN-style density clustering —
GriDBSCAN / grid-based DBSCAN family, public algorithms).

Points land in integer grid cells; two occupied cells are adjacent
when they touch in the 8-neighborhood; every point is labeled with its
cell component's minimum packed cell id. The caller supplies integer
cell coordinates (``gx``, ``gy``) — computing them from floats is the
caller's one map_batches so the operator itself carries no
float-boundary ambiguity (the query twin derives cells with pure
integer arithmetic for an exact DuckDB oracle).

Scale plan — every stage hash-bucketed, nothing on the driver:

1. **distinct cells** — per-batch cell dedup (combiner), then one
   hash-bucket exchange + per-bucket ``np.unique``: a cell holding
   10⁹ points costs one wire row per input batch.
2. **adjacency** — each occupied cell emits its 4 FORWARD neighbor
   probes (E, NE, N, NW — each unordered pair exactly once); probes
   meet the presence rows in one bucket exchange keyed on the target
   cell; per bucket a sort + ``searchsorted`` membership test turns
   probes into edges. Edge count ≤ 4 × occupied cells.
3. **components** — the cell graph is already the contraction of the
   point set (≤4 edges per occupied cell, 10⁹ points in one cell cost
   one node), so below ``cc_edge_threshold`` edges a driver union-find
   labels it directly (the same documented bounded-driver pattern as
   :func:`..functions.dedup.minhash_dedup_assign`); above it,
   :func:`..functions.dedup.label_propagation_components`
   (pointer-jumping min-label, O(log diameter) rounds, raises on
   non-convergence).
4. **point labeling** — points and (cell → label) rows meet in one
   bucket exchange keyed on the cell; cells outside every edge keep
   their own id as the label (isolated cells = singleton clusters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import effective_num_partitions, splitmix64

_CELL_SCHEMA = pa.schema([pa.field("bucket", pa.int32()), pa.field("pk", pa.int64())])
_ADJ_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("target", pa.int64()),
        pa.field("source", pa.int64()),
        pa.field("is_cell", pa.bool_()),
    ]
)
_EDGE_SCHEMA = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64())])
_LABELED_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("pk", pa.int64()),
        pa.field("key", pa.int64()),
        pa.field("is_label", pa.bool_()),
    ]
)
OUT_SCHEMA = pa.schema([pa.field("key", pa.int64()), pa.field("cluster", pa.int64())])

# forward half of the 8-neighborhood: E, NE, N, NW
_FWD_DX = np.array([1, 1, 0, -1], dtype=np.int64)
_FWD_DY = np.array([0, 1, 1, 1], dtype=np.int64)


def _bucket_of(pk: np.ndarray, nb: int) -> np.ndarray:
    return (splitmix64(pk.view(np.uint64)) % np.uint64(nb)).astype(np.int32)


def _ray_from_arrow(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def _driver_components(edges_ds) -> pa.Table:
    """Materialized edge Dataset (a, b) → (node, label) Arrow table via
    driver union-find with union-by-min-root (root = component min).
    Bounded by ``cc_edge_threshold`` at the call site."""
    parts = list(edges_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.schema(
            [pa.field("node", pa.int64()), pa.field("label", pa.int64())]
        ).empty_table()
    tbl = pa.concat_tables(parts)
    a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    nodes = np.unique(np.concatenate([a, b]))
    labels = np.fromiter(
        (find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes)
    )
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array(labels, pa.int64()),
        }
    )


def grid_cluster(
    points_ds,
    *,
    key_col: str = "key",
    gx_col: str = "gx",
    gy_col: str = "gy",
    pack: int = 100_000,
    num_partitions: int = 32,
    lp_max_iters: int = 30,
    cc_edge_threshold: int | None = 4_000_000,
):
    """points (key, gx, gy) → (key, cluster); cluster = min packed cell
    id (``gx*pack + gy``) of the point's 8-connected occupied-cell
    component."""
    from .functions.dedup import label_propagation_components

    nb = effective_num_partitions(num_partitions)
    packv = np.int64(pack)

    def cell_pk(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
        # gy must stay in [0, pack-2]: the encoding pk = gx*pack + gy is
        # bijective only for gy in [0, pack), and the N/NE/NW probes add
        # +1 to gy — a cell at gy = pack-1 would alias (gx+1, 0).
        if len(gx) and (
            int(gy.min()) < 0
            or int(gy.max()) > pack - 2
            or int(np.abs(gx).max()) >= 2**31
        ):
            raise ValueError(
                "grid_cluster: cell indices exceed the packing bounds "
                f"(0 <= gy <= {pack - 2}, |gx| < 2^31) — raise `pack` or "
                "shift the grid to non-negative y indices"
            )
        return gx * packv + gy

    def distinct_cells_batch(batch: pa.Table) -> pa.Table:
        gx = batch.column(gx_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = batch.column(gy_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pk = np.unique(cell_pk(gx, gy))
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(pk, nb), pa.int32()),
                "pk": pa.array(pk, pa.int64()),
            }
        ).cast(_CELL_SCHEMA)

    def unique_bucket(group: pa.Table) -> pa.Table:
        pk = np.unique(group.column("pk").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": group.column("bucket").slice(0, len(pk)),
                "pk": pa.array(pk, pa.int64()),
            }
        ).cast(_CELL_SCHEMA)

    cells = (
        points_ds.map_batches(
            distinct_cells_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(unique_bucket, batch_format="pyarrow")
    )

    def probes_and_presence(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        # floor div/mod invert cell_pk exactly because gy is guarded
        # into [0, pack-2] (bijective even for negative gx)
        gx, gy = pk // packv, pk % packv
        tx = (gx[:, None] + _FWD_DX[None, :]).ravel()
        ty = (gy[:, None] + _FWD_DY[None, :]).ravel()
        tpk = tx * packv + ty
        src = np.repeat(pk, 4)
        target = np.concatenate([tpk, pk])
        source = np.concatenate([src, pk])
        is_cell = np.concatenate(
            [np.zeros(len(tpk), dtype=bool), np.ones(len(pk), dtype=bool)]
        )
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(target, nb), pa.int32()),
                "target": pa.array(target, pa.int64()),
                "source": pa.array(source, pa.int64()),
                "is_cell": pa.array(is_cell, pa.bool_()),
            }
        ).cast(_ADJ_SCHEMA)

    def edges_bucket(group: pa.Table) -> pa.Table:
        is_cell = group.column("is_cell").to_numpy(zero_copy_only=False)
        target = group.column("target").to_numpy(zero_copy_only=False)
        source = group.column("source").to_numpy(zero_copy_only=False)
        present = np.sort(target[is_cell])
        probes = ~is_cell
        t, s = target[probes], source[probes]
        if len(present) == 0:
            hit = np.zeros(len(t), dtype=bool)
        else:
            pos = np.searchsorted(present, t)
            hit = (pos < len(present)) & (
                present[np.minimum(pos, len(present) - 1)] == t
            )
        return pa.table(
            {
                "a": pa.array(s[hit], pa.int64()),
                "b": pa.array(t[hit], pa.int64()),
            }
        ).cast(_EDGE_SCHEMA)

    edges = (
        cells.map_batches(
            probes_and_presence, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(edges_bucket, batch_format="pyarrow")
        .materialize()
    )

    if cc_edge_threshold is not None and edges.count() <= cc_edge_threshold:
        # bounded driver path: the cell graph, not the point set, comes
        # to the driver — union-by-min-root, so every root IS its
        # component's minimum cell id (same labels as the LP path)
        labels = _ray_from_arrow(_driver_components(edges))
    else:
        labels = label_propagation_components(edges, max_iters=lp_max_iters)

    def point_side(batch: pa.Table) -> pa.Table:
        gx = batch.column(gx_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = batch.column(gy_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pk = cell_pk(gx, gy)
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(pk, nb), pa.int32()),
                "pk": pa.array(pk, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "is_label": pa.array(np.zeros(len(pk), dtype=bool), pa.bool_()),
            }
        ).cast(_LABELED_SCHEMA)

    def label_side(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        label = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(node, nb), pa.int32()),
                "pk": pa.array(node, pa.int64()),
                "key": pa.array(label, pa.int64()),
                "is_label": pa.array(np.ones(len(node), dtype=bool), pa.bool_()),
            }
        ).cast(_LABELED_SCHEMA)

    def assign_bucket(group: pa.Table) -> pa.Table:
        is_label = group.column("is_label").to_numpy(zero_copy_only=False)
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        kv = group.column("key").to_numpy(zero_copy_only=False)
        lp_pk = pk[is_label]
        lp_lab = kv[is_label]
        order = np.argsort(lp_pk)
        lp_pk, lp_lab = lp_pk[order], lp_lab[order]
        p_pk, p_key = pk[~is_label], kv[~is_label]
        cluster = p_pk.copy()  # default: isolated cell labels itself
        if len(lp_pk):
            pos = np.searchsorted(lp_pk, p_pk)
            ok = (pos < len(lp_pk)) & (lp_pk[np.minimum(pos, len(lp_pk) - 1)] == p_pk)
            cluster[ok] = lp_lab[pos[ok]]
        return pa.table(
            {
                "key": pa.array(p_key, pa.int64()),
                "cluster": pa.array(cluster, pa.int64()),
            }
        ).cast(OUT_SCHEMA)

    pts = points_ds.map_batches(
        point_side, batch_format="pyarrow", zero_copy_batch=True
    )
    labs = labels.map_batches(label_side, batch_format="pyarrow", zero_copy_batch=True)
    return pts.union(labs).groupby("bucket").map_groups(
        assign_bucket, batch_format="pyarrow"
    )
