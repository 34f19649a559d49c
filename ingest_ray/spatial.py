"""Spatial joins beyond the reference's own operators — the new-engine
requirements of BASELINE.json north_star: point-in-polygon joins, kNN
with k-ring candidate expansion, raster↔vector joins.

All three reuse one primitive (SURVEY.md §2.3): key both sides by a
spatial cell, shuffle (or broadcast the small side), and run a
vectorized kernel per batch/partition — with an actor pool wherever an
index is worth building once per worker (§2.6 ST6).

Partitioning assumptions are stated per operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cells import hex_cell, hex_k_rings_batch
from .geom import points_in_polygon

# --------------------------------------------------------------------------
# point-in-polygon join
# --------------------------------------------------------------------------


class PolygonSet:
    """Packed-ring polygon store for broadcast PIP (Arrow-native ring
    buffers: flat f64 coords + per-ring offsets + per-poly ring spans)."""

    def __init__(self, poly_ids, ring_values, ring_offsets, poly_ring_spans, bboxes):
        self.poly_ids = poly_ids  # (P,)
        self.ring_values = ring_values  # flat interleaved lon,lat
        self.ring_offsets = ring_offsets  # pair offsets per ring
        self.poly_ring_spans = poly_ring_spans  # (P,2) start/end ring index
        self.bboxes = bboxes  # (P,4)

    @classmethod
    def from_features(cls, table: pa.Table):
        """Build from a features table (key, positions, ring_offsets,
        minx..maxy) — only area features (kind==3) are meaningful.
        Fully vectorized from the Arrow list offsets (no per-row
        Python): this builder also runs inside every
        ``pip_join_partitioned`` bucket."""
        ids = table.column("key").to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return cls(
                ids,
                np.empty(0),
                np.zeros(1, dtype=np.int64),
                np.empty((0, 2), dtype=np.int64),
                np.empty((0, 4)),
            )
        pos = table.column("positions")
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        ring = table.column("ring_offsets")
        if isinstance(ring, pa.ChunkedArray):
            ring = ring.combine_chunks()
        poff = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(
            pos.values.to_numpy(zero_copy_only=False)[poff[0] : poff[-1]], dtype=np.float64
        )
        poff = poff - poff[0]
        npairs = (poff[1:] - poff[:-1]) // 2
        base = np.cumsum(npairs) - npairs  # pair offset of each row's values
        roff = ring.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        rv = ring.values.to_numpy(zero_copy_only=False)[roff[0] : roff[-1]].astype(np.int64)
        roff = roff - roff[0]
        rcnt = roff[1:] - roff[:-1]
        # rows with an empty/null ring list default to one ring [0, npairs]
        eff_cnt = np.where(rcnt == 0, 1, rcnt - 1)  # rings per row
        starts = np.cumsum(eff_cnt) - eff_cnt  # first ring index per row
        out = np.empty(int(eff_cnt.sum()), dtype=np.int64)
        if len(rv):
            row_of = np.repeat(np.arange(n), rcnt)
            within = np.arange(len(rv), dtype=np.int64) - np.repeat(roff[:-1], rcnt)
            keep = within > 0  # drop each row's leading 0
            out[starts[row_of[keep]] + (within[keep] - 1)] = rv[keep] + base[row_of[keep]]
        dflt = np.flatnonzero(rcnt == 0)
        out[starts[dflt]] = base[dflt] + npairs[dflt]
        offsets = np.concatenate([np.zeros(1, dtype=np.int64), out])
        spans = np.column_stack([starts, starts + eff_cnt]).astype(np.int64)
        bboxes = np.column_stack(
            [
                table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in ("minx", "miny", "maxx", "maxy")
            ]
        )
        return cls(ids, vals, offsets, spans, bboxes)

    def contains(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """→ (point_idx, poly_id) pairs for every containment hit.

        Sorted-x bbox prefilter: points are sorted by x ONCE, each
        polygon's x-window is two searchsorteds (O(log N) instead of an
        O(N) mask per polygon — the per-polygon Python dispatch the
        round-4 verdict flagged for many-small-polygon buckets), then a
        y mask over the window and exact even-odd ray casting over the
        survivors. Candidate indices are re-sorted so output pair order
        is byte-identical to the full-scan version.
        """
        out_pt, out_poly = [], []
        n_poly = len(self.poly_ids)
        if n_poly == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
        x_order = np.argsort(px, kind="stable")
        sx, sy = px[x_order], py[x_order]
        lo_all = np.searchsorted(sx, self.bboxes[:, 0], side="left")
        hi_all = np.searchsorted(sx, self.bboxes[:, 2], side="right")
        for p in np.flatnonzero(hi_all > lo_all):
            b = self.bboxes[p]
            w0, w1 = lo_all[p], hi_all[p]
            wy = sy[w0:w1]
            m = (wy >= b[1]) & (wy <= b[3])
            if not m.any():
                continue
            cand = np.sort(x_order[w0:w1][m])
            r0, r1 = self.poly_ring_spans[p]
            # slice this polygon's rings out of the packed buffers
            lo = self.ring_offsets[r0]
            hi = self.ring_offsets[r1]
            vals = self.ring_values[2 * lo : 2 * hi]
            offs = self.ring_offsets[r0 : r1 + 1] - lo
            inside = points_in_polygon(px[cand], py[cand], vals, offs)
            hits = cand[inside]
            out_pt.append(hits)
            out_poly.append(np.full(len(hits), self.poly_ids[p], dtype=np.uint64))
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
        return np.concatenate(out_pt), np.concatenate(out_poly)


def pip_join(
    points_ds,
    polygons_table: pa.Table,
    x_col: str = "lon",
    y_col: str = "lat",
    keep_cols: tuple[str, ...] = (),
):
    """points Dataset ⋈ polygon set → (point cols…, poly_key).

    Broadcast strategy: the polygon set (packed rings) is put in the
    object store once; every batch runs the bbox-prefiltered ray-cast
    kernel. Partitioning assumption: the polygon side fits one worker;
    when it doesn't, use :func:`pip_join_partitioned` (same kernel,
    bucket-local polygon sets, property-tested equal output).
    """
    pset_ref = ray.put(PolygonSet.from_features(polygons_table))

    def fn(batch: pa.Table) -> pa.Table:
        pset: PolygonSet = ray.get(pset_ref)
        px = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pt_idx, poly_id = pset.contains(px, py)
        cols = {}
        take = pa.array(pt_idx, pa.int64())
        for c in (x_col, y_col, *keep_cols):
            cols[c] = batch.column(c).take(take)
        cols["poly_key"] = pa.array(poly_id, pa.uint64())
        return pa.table(cols)

    return points_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pip_join_partitioned(
    points_ds,
    polygons_ds,
    x_col: str = "lon",
    y_col: str = "lat",
    keep_cols: tuple[str, ...] = (),
    res: int = 5,
    num_buckets: int = 64,
    cover_cap: int = 4096,
):
    """Cell-partitioned PIP join — BOTH sides are Datasets; nothing is
    driver-materialized or broadcast (the planet-scale path promised by
    :func:`pip_join`'s docstring; output equals the broadcast variant,
    property-tested).

    Plan: points hash to the bucket of their own res-``res`` hex cell;
    each polygon replicates ONCE PER DISTINCT BUCKET its bbox cover
    touches — geometry never ships per cover cell, so replication is
    bounded at ``num_buckets`` copies regardless of bbox area (a
    world-spanning polygon costs 64 rows, not 3×10⁵). Polygons whose
    estimated cover exceeds ``cover_cap`` cells skip the cover
    enumeration entirely and go to every bucket — a superset routing
    that is always correct and caps the per-polygon explode cost.

    Correctness: a hit pair (point ∈ polygon) implies the point's cell
    intersects the polygon bbox, hence lies in the bbox cover
    (``hex_cover_bbox`` is a superset cover), hence the polygon is
    present in the point's bucket. The point lives in exactly one
    bucket and the bucket dedupes polygons by key, so every pair is
    emitted exactly once. Within a bucket the vectorized bbox
    prefilter in :meth:`PolygonSet.contains` restricts the exact
    ray-cast to candidate points — no per-cell rescan of the bucket.
    """
    from .cells import _SQRT3, _hex_size, hex_cover_bbox
    from .util import splitmix64

    pt_cols = [x_col, y_col, *keep_cols]
    all_buckets = np.arange(num_buckets, dtype=np.int32)

    def explode_polys(batch: pa.Table) -> pa.Table:
        minx = batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float64)
        miny = batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float64)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64)
        s = _hex_size(res)
        # cheap upper-bound-ish cover size from bbox extent / hex pitch
        # (routing heuristic only: both branches below are exact)
        est = ((maxx - minx) / (_SQRT3 * s) + 3.0) * ((maxy - miny) / (1.5 * s) + 3.0)
        rows_parts, bucket_parts = [], []
        for i in range(len(batch)):
            if est[i] > cover_cap:
                bks = all_buckets
            else:
                cover = hex_cover_bbox(minx[i], miny[i], maxx[i], maxy[i], res)
                bks = np.unique(
                    (splitmix64(cover) % np.uint64(num_buckets)).astype(np.int32)
                )
            rows_parts.append(np.full(len(bks), i, dtype=np.int64))
            bucket_parts.append(bks)
        rows = np.concatenate(rows_parts) if rows_parts else np.empty(0, dtype=np.int64)
        buckets = (
            np.concatenate(bucket_parts) if bucket_parts else np.empty(0, dtype=np.int32)
        )
        sub = batch.take(pa.array(rows, pa.int64()))
        n = len(sub)
        out = {
            "bucket": pa.array(buckets, pa.int32()),
            "is_poly": pa.array(np.ones(n, dtype=bool), pa.bool_()),
            "key": sub.column("key"),
            "positions": sub.column("positions"),
            "ring_offsets": sub.column("ring_offsets"),
            "minx": sub.column("minx"),
            "miny": sub.column("miny"),
            "maxx": sub.column("maxx"),
            "maxy": sub.column("maxy"),
        }
        for c in pt_cols:
            out[f"pt_{c}"] = pa.nulls(n, pa.float64())
        return pa.table(out)

    def explode_points(batch: pa.Table) -> pa.Table:
        px = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        cells = hex_cell(px, py, res)
        buckets = (splitmix64(cells) % np.uint64(num_buckets)).astype(np.int32)
        n = len(batch)
        empty_i32 = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()), pa.array([], pa.int32())
        )
        empty_f32 = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()), pa.array([], pa.float32())
        )
        out = {
            "bucket": pa.array(buckets, pa.int32()),
            "is_poly": pa.array(np.zeros(n, dtype=bool), pa.bool_()),
            "key": pa.nulls(n, pa.uint64()),
            "positions": empty_f32,
            "ring_offsets": empty_i32,
            "minx": pa.nulls(n, pa.float32()),
            "miny": pa.nulls(n, pa.float32()),
            "maxx": pa.nulls(n, pa.float32()),
            "maxy": pa.nulls(n, pa.float32()),
        }
        for c in pt_cols:
            out[f"pt_{c}"] = batch.column(c).cast(pa.float64())
        return pa.table(out)

    polys = polygons_ds.map_batches(explode_polys, batch_format="pyarrow", zero_copy_batch=True)
    points = points_ds.map_batches(explode_points, batch_format="pyarrow", zero_copy_batch=True)
    # NOTE: the groupby's sort-shuffle inherits its partition count from
    # the input block count — callers must feed multi-block Datasets
    # (a single-block input runs per_bucket 1-wide no matter the cluster
    # width; size reads to ≥2 blocks/CPU upstream, not here, so a
    # well-partitioned input doesn't pay a redundant exchange)
    bucketed = polys.union(points)

    OUT_SCHEMA = pa.schema(
        [pa.field(c, pa.float64()) for c in pt_cols] + [pa.field("poly_key", pa.uint64())]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_poly = t.column("is_poly")
        pts = t.filter(pc.invert(is_poly))
        pls = t.filter(is_poly)
        if len(pts) == 0 or len(pls) == 0:
            return OUT_SCHEMA.empty_table()
        # dedupe polygons by key (replicated once per touched bucket)
        keys = pls.column("key").to_numpy(zero_copy_only=False)
        _, first = np.unique(keys, return_index=True)
        pls = pls.take(pa.array(np.sort(first), pa.int64()))
        pset = PolygonSet.from_features(pls)
        px = pts.column(f"pt_{x_col}").to_numpy(zero_copy_only=False)
        py = pts.column(f"pt_{y_col}").to_numpy(zero_copy_only=False)
        pt_idx, poly_id = pset.contains(px, py)
        take = pa.array(pt_idx, pa.int64())
        cols = {c: pts.column(f"pt_{c}").take(take) for c in pt_cols}
        cols["poly_key"] = pa.array(poly_id, pa.uint64())
        return pa.table(cols).cast(OUT_SCHEMA)

    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


# --------------------------------------------------------------------------
# kNN join (k-ring candidate expansion + actor-pool cell index)
# --------------------------------------------------------------------------


class CellIndex:
    """Per-worker spatial index: hex cell → (ids, coords) arrays.

    Built ONCE per actor from a broadcast corpus (ST6 — the one place
    actor state is genuinely required, SURVEY.md §2.6)."""

    def __init__(self, ids: np.ndarray, xs: np.ndarray, ys: np.ndarray, res: int):
        self.res = res
        cells = hex_cell(xs, ys, res)
        # (cell, id) order — input-order independent, so a per-partition
        # index answers EXACTLY like the global broadcast index
        # (including distance-tie ordering in top-k)
        order = np.lexsort((ids, cells))
        self.cells_sorted = cells[order]
        self.ids = ids[order]
        self.xs = xs[order]
        self.ys = ys[order]

    def candidates(self, cell_list: np.ndarray) -> np.ndarray:
        """Indexes of all points in any of the given cells."""
        lo = np.searchsorted(self.cells_sorted, cell_list, side="left")
        hi = np.searchsorted(self.cells_sorted, cell_list, side="right")
        if len(lo) == 0:
            return np.empty(0, dtype=np.int64)
        parts = [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


class KnnActor:
    """Actor-pool map_batches callable: kNN for query points.

    __init__ builds the cell index once per actor (from the broadcast
    object ref); __call__ answers per batch with k-ring expansion:
    start at ring 1, widen until ≥k candidates or max_ring, then exact
    top-k by squared euclidean distance (vectorized).
    """

    def __init__(self, index_ref, k: int = 5, res: int = 7, max_ring: int = 6):
        self.index: CellIndex = ray.get(index_ref)
        self.k = k
        self.res = res
        self.max_ring = max_ring

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch.column("lon").to_numpy(zero_copy_only=False).astype(np.float64)
        qy = batch.column("lat").to_numpy(zero_copy_only=False).astype(np.float64)
        qid = batch.column("qid").to_numpy(zero_copy_only=False)
        return knn_answer(self.index, qx, qy, qid, self.k, self.res, self.max_ring)


_KNN_SCHEMA = pa.schema(
    [
        pa.field("qid", pa.int64()),
        pa.field("neighbor_id", pa.int64()),
        pa.field("dist", pa.float64()),
        pa.field("rank", pa.int32()),
    ]
)


def knn_answer(
    index: CellIndex, qx, qy, qid, k: int, res: int, max_ring: int = 6
) -> pa.Table:
    """k-ring-expanding top-k against a CellIndex (shared by the
    broadcast actor pool and the cell-partitioned join — deterministic
    given the index's (cell, id) ordering)."""
    out_q, out_n, out_d, out_rank = [], [], [], []
    cells = hex_cell(qx, qy, res)
    for i in range(len(qx)):
        ring = 1
        cand = np.empty(0, dtype=np.int64)
        while ring <= max_ring:
            flat, _ = hex_k_rings_batch(cells[i : i + 1], ring)
            cand = index.candidates(np.unique(flat))
            if len(cand) >= k:
                # one extra ring so the true top-k can't hide just
                # outside the searched ring boundary
                flat, _ = hex_k_rings_batch(cells[i : i + 1], ring + 1)
                cand = index.candidates(np.unique(flat))
                break
            ring += 1
        if len(cand) == 0:
            continue
        dx = index.xs[cand] - qx[i]
        dy = index.ys[cand] - qy[i]
        d2 = dx * dx + dy * dy
        kk = min(k, len(cand))
        top = np.argpartition(d2, kk - 1)[:kk]
        top = top[np.argsort(d2[top], kind="stable")]
        out_q.append(np.full(kk, qid[i]))
        out_n.append(index.ids[cand[top]])
        out_d.append(np.sqrt(d2[top]))
        out_rank.append(np.arange(kk, dtype=np.int32))
    if not out_q:
        return _KNN_SCHEMA.empty_table()
    return pa.table(
        {
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "dist": pa.array(np.concatenate(out_d), pa.float64()),
            "rank": pa.array(np.concatenate(out_rank), pa.int32()),
        }
    )


def knn_join(
    queries_ds,
    corpus_table: pa.Table,
    k: int = 5,
    res: int = 7,
    concurrency: int = 4,
    id_col: str = "id",
    x_col: str = "lon",
    y_col: str = "lat",
):
    """queries (qid, lon, lat) ⋈ corpus → top-k neighbors per query.

    Partitioning assumption: the corpus index fits worker memory (it
    is broadcast once; at planet scale, partition both sides by a
    coarse cell first and build per-partition indexes — the actor
    signature stays the same).
    """
    ids = corpus_table.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    xs = corpus_table.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ys = corpus_table.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    index_ref = ray.put(CellIndex(ids, xs, ys, res))
    return queries_ds.map_batches(
        KnnActor,
        fn_constructor_kwargs={"index_ref": index_ref, "k": k, "res": res},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def knn_join_partitioned(
    queries_ds,
    corpus_ds,
    k: int = 5,
    res: int = 7,
    coarse_res: int | None = None,
    num_buckets: int = 64,
    id_col: str = "id",
    x_col: str = "lon",
    y_col: str = "lat",
    max_ring: int = 6,
):
    """Cell-partitioned kNN — corpus is a Dataset, never collected to
    the driver or broadcast whole (the planet-scale path promised by
    :func:`knn_join`; output equals the broadcast variant,
    property-tested).

    Corpus points replicate to their COARSE hex cell plus its 1-ring
    halo (×7); queries go to their own coarse cell. The coarse
    resolution is chosen so one coarse ring strictly covers the
    maximum fine-ring search radius — every candidate the global index
    could return is present in the query's partition, and the
    per-partition CellIndex answers identically (its (cell, id)
    ordering is input-order independent).
    """
    import pandas as pd

    from .util import splitmix64

    # one coarse ring must cover (max_ring + 2) fine rings; hex size
    # halves per res step, so 4 levels coarser gives a 16x cell span
    coarse = coarse_res if coarse_res is not None else max(0, res - 4)

    def corpus_side(batch: pa.Table) -> pa.Table:
        xs = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ys = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        home = hex_cell(xs, ys, coarse)
        halo, _ = hex_k_rings_batch(home, 1)  # 7 cells per point, row-major
        rep = len(halo) // max(len(ids), 1)
        n = len(ids) * rep
        return pa.table(
            {
                "tcell": pa.array(halo, pa.uint64()),
                "is_corpus": pa.array(np.ones(n, dtype=bool), pa.bool_()),
                "id": pa.array(np.repeat(ids, rep), pa.int64()),
                "x": pa.array(np.repeat(xs, rep), pa.float64()),
                "y": pa.array(np.repeat(ys, rep), pa.float64()),
            }
        )

    def query_side(batch: pa.Table) -> pa.Table:
        xs = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ys = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        qid = batch.column("qid").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tcell": pa.array(hex_cell(xs, ys, coarse), pa.uint64()),
                "is_corpus": pa.array(np.zeros(len(qid), dtype=bool), pa.bool_()),
                "id": pa.array(qid, pa.int64()),
                "x": pa.array(xs, pa.float64()),
                "y": pa.array(ys, pa.float64()),
            }
        )

    unioned = corpus_ds.map_batches(
        corpus_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(queries_ds.map_batches(query_side, batch_format="pyarrow", zero_copy_batch=True))

    def add_bucket(batch: pa.Table) -> pa.Table:
        c = batch.column("tcell").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(c) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = unioned.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        is_c = df["is_corpus"].to_numpy(dtype=bool)
        parts = []
        qsub_all = df[~is_c]
        csub_all = df[is_c]
        if len(qsub_all) == 0 or len(csub_all) == 0:
            return _KNN_SCHEMA.empty_table()
        # group the corpus side ONCE — the previous per-query-cell boolean
        # mask rescanned the whole bucket per cell, O(cells × bucket_rows)
        cgroups = {tc: g for tc, g in csub_all.groupby("tcell")}
        for tcell, qsub in qsub_all.groupby("tcell"):
            csub = cgroups.get(tcell)
            if csub is None:
                continue
            cd = csub.drop_duplicates("id")
            index = CellIndex(
                cd["id"].to_numpy(dtype=np.int64),
                cd["x"].to_numpy(dtype=np.float64),
                cd["y"].to_numpy(dtype=np.float64),
                res,
            )
            parts.append(
                knn_answer(
                    index,
                    qsub["x"].to_numpy(dtype=np.float64),
                    qsub["y"].to_numpy(dtype=np.float64),
                    qsub["id"].to_numpy(dtype=np.int64),
                    k,
                    res,
                    max_ring,
                )
            )
        if not parts:
            return _KNN_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def _empty_raster_vector_result():
    import ray.data as rd

    return rd.from_arrow(
        pa.schema(
            [
                pa.field("key", pa.uint64()),
                pa.field("chip_mean", pa.float64()),
                pa.field("chips", pa.int32()),
            ]
        ).empty_table()
    )


def raster_vector_join_partitioned(
    features_ds,
    chips_ds,
    res: int = 7,
    cover_cap: int = 4096,
    big_collect_limit: int = 65536,
):
    """Cell-keyed raster↔vector join with a distributed hash join —
    chips are a Dataset, not a broadcast table (the planet-scale path
    promised by :func:`raster_vector_join`; output equals the
    broadcast variant, property-tested).

    features → exploded (cell, key) cover rows ⋈ chips on cell →
    groupby(key) mean/count. Only (cell, key) pairs and matched chip
    values cross the exchanges.

    Cover explosion is BOUNDED (the round-2 bench showed the unclipped
    version enumerating ~10⁷ res-7 cells per world-spanning feature):
    feature bboxes are clipped to the raster extent first (an
    aggregate over chip-cell centers, mirroring the broadcast
    variant's clip), and any feature whose clipped cover would still
    exceed ``cover_cap`` cells skips enumeration — it is matched
    against chips with the O(1)
    :func:`ingest_ray.cells.hex_cover_contains` test instead. Up to
    ``big_collect_limit`` such features ride a driver-collected
    broadcast (few by area distribution); beyond that the big side
    stays a Dataset, replicated once per chip hash bucket and matched
    inside a bucket groupby — no corpus-rate-dependent driver path at
    ANY big-feature rate (same compute, one extra exchange).
    """
    from ray.data.aggregate import Count, Max, Mean, Min

    from .cells import _SQRT3, _hex_size, hex_center, hex_cover_bbox, hex_cover_contains
    from .util import effective_num_partitions, splitmix64, tune_shuffle_context

    chips_ds = chips_ds.materialize()  # consumed by extent agg + join (+ big scan)

    def chip_centers(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        cx, cy = hex_center(cells)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    erow = chips_ds.map_batches(
        chip_centers, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Min("cx", alias_name="x0"),
        Min("cy", alias_name="y0"),
        Max("cx", alias_name="x1"),
        Max("cy", alias_name="y1"),
    )
    if erow is None or erow.get("x0") is None:
        # no chips: nothing can match; the extent is undefined
        return _empty_raster_vector_result()
    s = _hex_size(res)
    margin = 2.0 * s
    extent = (
        float(erow["x0"]) - margin,
        float(erow["y0"]) - margin,
        float(erow["x1"]) + margin,
        float(erow["y1"]) + margin,
    )

    def explode_cover(batch: pa.Table) -> pa.Table:
        minx = np.maximum(
            batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float64), extent[0]
        )
        miny = np.maximum(
            batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float64), extent[1]
        )
        maxx = np.minimum(
            batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64), extent[2]
        )
        maxy = np.minimum(
            batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64), extent[3]
        )
        keys = batch.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        est = ((maxx - minx) / (_SQRT3 * s) + 3.0) * ((maxy - miny) / (1.5 * s) + 3.0)
        cell_parts, key_parts, big_idx = [], [], []
        for i in np.flatnonzero((minx <= maxx) & (miny <= maxy)):
            if est[i] > cover_cap:
                big_idx.append(i)
                continue
            cover = hex_cover_bbox(minx[i], miny[i], maxx[i], maxy[i], res)
            cell_parts.append(cover.view(np.int64))
            key_parts.append(np.full(len(cover), keys[i], dtype=np.uint64))
        n_big = len(big_idx)
        bi = np.array(big_idx, dtype=np.int64)
        cells = (
            np.concatenate(cell_parts) if cell_parts else np.empty(0, dtype=np.int64)
        )
        skeys = np.concatenate(key_parts) if key_parts else np.empty(0, dtype=np.uint64)
        n_small = len(cells)
        return pa.table(
            {
                "ccell": pa.array(
                    np.concatenate([cells, np.full(n_big, -1, dtype=np.int64)]), pa.int64()
                ),
                "key": pa.array(np.concatenate([skeys, keys[bi]]), pa.uint64()),
                # clipped bbox, only for sentinel (big) rows
                "bminx": pa.array(
                    np.concatenate([np.full(n_small, np.nan), minx[bi]]), pa.float64()
                ),
                "bminy": pa.array(
                    np.concatenate([np.full(n_small, np.nan), miny[bi]]), pa.float64()
                ),
                "bmaxx": pa.array(
                    np.concatenate([np.full(n_small, np.nan), maxx[bi]]), pa.float64()
                ),
                "bmaxy": pa.array(
                    np.concatenate([np.full(n_small, np.nan), maxy[bi]]), pa.float64()
                ),
            }
        )

    def chip_side(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "chip_cell": pa.array(cells.view(np.int64), pa.int64()),
                "band_mean": batch.column("band_mean"),
            }
        )

    exploded = features_ds.map_batches(
        explode_cover, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    cover = exploded.filter(expr="ccell >= 0").select_columns(["ccell", "key"])
    big_ds = exploded.filter(expr="ccell < 0").materialize()
    n_big = big_ds.count()

    chips = chips_ds.map_batches(chip_side, batch_format="pyarrow", zero_copy_batch=True)
    n_small = exploded.count() - n_big
    branches = []
    if n_small > 0:
        tune_shuffle_context()
        branches.append(
            cover.join(
                chips,
                join_type="inner",
                num_partitions=effective_num_partitions(16),
                on=("ccell",),
                right_on=("chip_cell",),
            ).select_columns(["key", "band_mean"])
        )

    def _match_block(bkeys, bboxes, cells, vals) -> pa.Table:
        out_k, out_v = [], []
        for j in range(len(bkeys)):
            m = hex_cover_contains(cells, *bboxes[j], res)
            if m.any():
                out_k.append(np.full(int(m.sum()), bkeys[j], dtype=np.uint64))
                out_v.append(vals[m])
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate(out_k) if out_k else np.empty(0, np.uint64), pa.uint64()
                ),
                "band_mean": pa.array(
                    np.concatenate(out_v) if out_v else np.empty(0, np.float64), pa.float64()
                ),
            }
        )

    if 0 < n_big <= big_collect_limit:
        # few big features: broadcast their (key, bbox) rows once
        big_t = pa.concat_tables(
            list(big_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)),
            promote_options="default",
        )
        big_ref = ray.put(
            (
                big_t.column("key").to_numpy(zero_copy_only=False).astype(np.uint64),
                np.column_stack(
                    [
                        big_t.column(c).to_numpy(zero_copy_only=False)
                        for c in ("bminx", "bminy", "bmaxx", "bmaxy")
                    ]
                ),
            )
        )

        def match_big(batch: pa.Table) -> pa.Table:
            bkeys, bboxes = ray.get(big_ref)
            cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
            vals = batch.column("band_mean").to_numpy(zero_copy_only=False)
            return _match_block(bkeys, bboxes, cells, vals)

        branches.append(
            chips_ds.map_batches(match_big, batch_format="pyarrow", zero_copy_batch=True)
        )
    elif n_big > big_collect_limit:
        # big-feature count outgrew the broadcast: keep the big side a
        # Dataset — replicate each big row to every chip hash bucket
        # (bounded ×NB copies), chips hash once, one bucket groupby
        # runs the same O(1)-membership kernel. No driver collect.
        NB = 64

        def rep_big(batch: pa.Table) -> pa.Table:
            n = len(batch)
            sub = batch.select(["key", "bminx", "bminy", "bmaxx", "bmaxy"]).take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), NB), pa.int64())
            )
            out = pa.table(
                {
                    "bucket": pa.array(np.tile(np.arange(NB, dtype=np.int32), n), pa.int32()),
                    "is_chip": pa.array(np.zeros(n * NB, dtype=bool), pa.bool_()),
                    "key": sub.column("key"),
                    "bminx": sub.column("bminx"),
                    "bminy": sub.column("bminy"),
                    "bmaxx": sub.column("bmaxx"),
                    "bmaxy": sub.column("bmaxy"),
                    "cell": pa.nulls(n * NB, pa.int64()),
                    "band_mean": pa.nulls(n * NB, pa.float64()),
                }
            )
            return out

        def chip_rows(batch: pa.Table) -> pa.Table:
            cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
            n = len(cells)
            bk = (splitmix64(cells) % np.uint64(NB)).astype(np.int32)
            nanf = np.full(n, np.nan)
            return pa.table(
                {
                    "bucket": pa.array(bk, pa.int32()),
                    "is_chip": pa.array(np.ones(n, dtype=bool), pa.bool_()),
                    "key": pa.array(np.zeros(n, dtype=np.uint64), pa.uint64()),
                    "bminx": pa.array(nanf, pa.float64()),
                    "bminy": pa.array(nanf, pa.float64()),
                    "bmaxx": pa.array(nanf, pa.float64()),
                    "bmaxy": pa.array(nanf, pa.float64()),
                    "cell": pa.array(cells.view(np.int64), pa.int64()),
                    "band_mean": batch.column("band_mean").cast(pa.float64()),
                }
            )

        both = big_ds.map_batches(rep_big, batch_format="pyarrow", zero_copy_batch=True).union(
            chips_ds.map_batches(chip_rows, batch_format="pyarrow", zero_copy_batch=True)
        )

        BIG_OUT = pa.schema(
            [pa.field("key", pa.uint64()), pa.field("band_mean", pa.float64())]
        )

        def big_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            is_chip = t.column("is_chip")
            ch = t.filter(is_chip)
            ft = t.filter(pc.invert(is_chip))
            if len(ch) == 0 or len(ft) == 0:
                return BIG_OUT.empty_table()
            cells = ch.column("cell").to_numpy(zero_copy_only=False).view(np.uint64)
            vals = ch.column("band_mean").to_numpy(zero_copy_only=False)
            bkeys = ft.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
            bboxes = np.column_stack(
                [
                    ft.column(c).to_numpy(zero_copy_only=False)
                    for c in ("bminx", "bminy", "bmaxx", "bmaxy")
                ]
            )
            return _match_block(bkeys, bboxes, cells, vals).cast(BIG_OUT)

        branches.append(both.groupby("bucket").map_groups(big_bucket, batch_format="pyarrow"))

    if not branches:
        return _empty_raster_vector_result()
    joined = branches[0]
    for b in branches[1:]:
        joined = joined.union(b)
    agg = joined.groupby("key").aggregate(
        Mean("band_mean", alias_name="chip_mean"), Count(alias_name="chips")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("key").cast(pa.uint64()),
                "chip_mean": batch.column("chip_mean"),
                "chips": batch.column("chips").cast(pa.int32()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# raster ↔ vector join
# --------------------------------------------------------------------------


def synth_raster_chips(bounds: tuple[float, float, float, float], res: int, seed: int = 42):
    """Deterministic raster chip table: one chip per hex cell covering
    ``bounds`` with a synthetic band value (no raster libs in this
    sandbox — the chip payload is a stand-in; the join plumbing is
    real)."""
    from .cells import hex_cover_bbox
    from .util import splitmix64

    cells = hex_cover_bbox(*bounds, res)
    vals = (splitmix64(cells + np.uint64(seed)) % np.uint64(1000)).astype(np.float64) / 10.0
    return pa.table(
        {
            "cell": pa.array(cells, pa.uint64()),
            "band_mean": pa.array(vals, pa.float64()),
        }
    )


def raster_vector_join(features_ds, chips_table: pa.Table, res: int = 7):
    """features ⋈ raster chips on shared hex cell keys.

    Each feature's bbox is covered by hex cells (vector cell cover);
    chip stats are aggregated per feature (mean of covered chips).
    Broadcast chips (sorted-array lookup); for planet-scale rasters,
    swap the broadcast for a Dataset.join on ``cell``.
    """
    raw_cells = chips_table.column("cell").to_numpy(zero_copy_only=False)
    cells_sorted = np.sort(raw_cells)
    order = np.argsort(raw_cells, kind="stable")
    vals_sorted = chips_table.column("band_mean").to_numpy(zero_copy_only=False)[order]

    # raster extent: feature bboxes are clipped to it before covering —
    # a world-spanning feature would otherwise expand to millions of
    # cover cells that cannot match any chip anyway
    from .cells import _hex_size, hex_center

    ccx, ccy = hex_center(raw_cells)
    margin = 2.0 * _hex_size(res)
    extent = (
        float(ccx.min() - margin),
        float(ccy.min() - margin),
        float(ccx.max() + margin),
        float(ccy.max() + margin),
    )
    ref = ray.put((cells_sorted, vals_sorted))

    from .cells import hex_cover_bbox

    def fn(batch: pa.Table) -> pa.Table:
        cells_s, vals_s = ray.get(ref)
        minx = np.maximum(batch.column("minx").to_numpy(zero_copy_only=False), extent[0])
        miny = np.maximum(batch.column("miny").to_numpy(zero_copy_only=False), extent[1])
        maxx = np.minimum(batch.column("maxx").to_numpy(zero_copy_only=False), extent[2])
        maxy = np.minimum(batch.column("maxy").to_numpy(zero_copy_only=False), extent[3])
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        overlaps = (minx <= maxx) & (miny <= maxy)
        out_key, out_mean, out_n = [], [], []
        for i in np.flatnonzero(overlaps):
            cover = hex_cover_bbox(minx[i], miny[i], maxx[i], maxy[i], res)
            idx = np.searchsorted(cells_s, cover)
            idx_c = np.clip(idx, 0, len(cells_s) - 1)
            hit = (idx < len(cells_s)) & (cells_s[idx_c] == cover)
            if not hit.any():
                continue
            out_key.append(keys[i])
            out_mean.append(float(vals_s[idx_c[hit]].mean()))
            out_n.append(int(hit.sum()))
        return pa.table(
            {
                "key": pa.array(np.array(out_key, dtype=np.uint64), pa.uint64()),
                "chip_mean": pa.array(out_mean, pa.float64()),
                "chips": pa.array(out_n, pa.int32()),
            }
        )

    return features_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# within-radius distance join (grid-partitioned)
# --------------------------------------------------------------------------


_CELL_I32 = 2**31


def _grid_idx(v: np.ndarray, cell: float) -> np.ndarray:
    return np.floor(v / cell).astype(np.int64)


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Bijective (cx, cy) → uint64 for int32-range indices (guarded at
    the explode stages — a packed key past 2³¹ would alias silently,
    the same failure mode the dedup pair keys were widened for)."""
    m = np.uint64(0xFFFFFFFF)
    return ((cx.astype(np.uint64) & m) << np.uint64(32)) | (cy.astype(np.uint64) & m)


def _guard_i32(cx: np.ndarray, cy: np.ndarray, what: str) -> None:
    if len(cx) and (
        int(np.abs(cx).max()) >= _CELL_I32 or int(np.abs(cy).max()) >= _CELL_I32
    ):
        raise ValueError(
            f"{what}: grid cell indices exceed int32 — the cell size is too "
            "small relative to the coordinate extent for the packed cell key"
        )


def _range_expand(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized expansion of per-row index ranges [lo, hi) →
    (row_of_each_output, flat_index_into_sorted_side)."""
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
    run_start = np.cumsum(counts) - counts
    within = np.arange(total, dtype=np.int64) - np.repeat(run_start, counts)
    return rows, np.repeat(lo, counts) + within


def radius_join(
    points_ds,
    queries_ds,
    radius: float,
    *,
    point_key: str = "id",
    query_key: str = "qid",
    x_col: str = "lon",
    y_col: str = "lat",
    num_buckets: int = 64,
):
    """All (query, point) pairs within Euclidean ``radius`` (closed
    ball, coordinate units) — BOTH sides are Datasets; nothing is
    broadcast or driver-materialized.

    Plan: grid cell size = ``radius``. A point routes to the bucket of
    its own cell (ONE row); a query replicates to its 3×3 cell halo
    (nine rows). Any in-radius pair has the point's cell inside the
    query's halo, and a point lives in exactly one cell, so every pair
    meets in EXACTLY one (cell, bucket) — exactly-once output with no
    dedup shuffle. Within a bucket, pairing is per exact cell: one
    argsort of the point rows by packed cell key + a searchsorted
    range expansion per query row; the exact distance test then prunes
    halo candidates. Replication cost: 9 rows/query, 1 row/point.

    The reference resolves its geo lookups through a bbox interval
    tree (eyros, /root/reference/src/lib.rs:24-27); this is the same
    candidate-pruning idea expressed as a shuffle key.
    """
    from .util import splitmix64

    r2 = float(radius) * float(radius)
    WIRE = pa.schema(
        [
            pa.field("bucket", pa.int32()),
            pa.field("cx", pa.int64()),
            pa.field("cy", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("key", pa.int64()),
            pa.field("x", pa.float64()),
            pa.field("y", pa.float64()),
        ]
    )
    OUT = pa.schema(
        [
            pa.field(query_key, pa.int64()),
            pa.field(point_key, pa.int64()),
            pa.field("d2", pa.float64()),
        ]
    )

    def point_side(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        cx, cy = _grid_idx(x, radius), _grid_idx(y, radius)
        _guard_i32(cx, cy, "radius_join")
        bk = (splitmix64(_pack_cell(cx, cy)) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bk, pa.int32()),
                "cx": pa.array(cx, pa.int64()),
                "cy": pa.array(cy, pa.int64()),
                "side": pa.array(np.zeros(len(x), dtype=np.int8), pa.int8()),
                "key": batch.column(point_key).cast(pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        ).cast(WIRE)

    def query_side(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        k = batch.column(query_key).to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = _grid_idx(x, radius), _grid_idx(y, radius)
        _guard_i32(cx, cy, "radius_join")
        n = len(x)
        rep = np.repeat(np.arange(n, dtype=np.int64), 9)
        dxy = np.arange(9, dtype=np.int64)
        hx = np.tile(dxy // 3 - 1, n)
        hy = np.tile(dxy % 3 - 1, n)
        hcx, hcy = cx[rep] + hx, cy[rep] + hy
        bk = (splitmix64(_pack_cell(hcx, hcy)) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bk, pa.int32()),
                "cx": pa.array(hcx, pa.int64()),
                "cy": pa.array(hcy, pa.int64()),
                "side": pa.array(np.ones(len(rep), dtype=np.int8), pa.int8()),
                "key": pa.array(k[rep], pa.int64()),
                "x": pa.array(x[rep], pa.float64()),
                "y": pa.array(y[rep], pa.float64()),
            }
        ).cast(WIRE)

    pts = points_ds.map_batches(point_side, batch_format="pyarrow", zero_copy_batch=True)
    qs = queries_ds.map_batches(query_side, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy(zero_copy_only=False)
        is_pt = side == 0
        if not is_pt.any() or is_pt.all():
            return OUT.empty_table()
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        pk = _pack_cell(cx, cy)
        p_rows = np.flatnonzero(is_pt)
        q_rows = np.flatnonzero(~is_pt)
        order = p_rows[np.argsort(pk[p_rows], kind="stable")]
        pks = pk[order]
        lo = np.searchsorted(pks, pk[q_rows], side="left")
        hi = np.searchsorted(pks, pk[q_rows], side="right")
        qi, flat = _range_expand(lo, hi)
        if len(qi) == 0:
            return OUT.empty_table()
        qr = q_rows[qi]
        pr = order[flat]
        dx = x[qr] - x[pr]
        dy = y[qr] - y[pr]
        d2 = dx * dx + dy * dy
        keep = d2 <= r2
        return pa.table(
            {
                query_key: pa.array(key[qr][keep], pa.int64()),
                point_key: pa.array(key[pr][keep], pa.int64()),
                "d2": pa.array(d2[keep], pa.float64()),
            }
        ).cast(OUT)

    return pts.union(qs).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


# --------------------------------------------------------------------------
# bbox-overlap (rectangle intersection) join — PBSM with reference-point
# dedup
# --------------------------------------------------------------------------


def bbox_overlap_join_broadcast(
    left_ds,
    right_table: pa.Table,
    *,
    left_key: str = "key",
    right_key: str = "key",
    chunk: int = 4096,
):
    """left rectangles Dataset ⋈ right rectangle Table on closed-edge
    bbox intersection → (l_key, r_key). Broadcast strategy: the right
    table ships once via the object store; each left batch runs a
    chunked vectorized interval-overlap kernel (the reference's
    interval-overlap test, /root/reference/src/divide.rs:74-99, lifted
    to a join predicate). Partitioning assumption: the right side fits
    one worker — the scale path is :func:`bbox_overlap_join`
    (property-tested equal)."""
    r_ref = ray.put(
        (
            right_table.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64),
            right_table.column("minx").to_numpy(zero_copy_only=False).astype(np.float64),
            right_table.column("miny").to_numpy(zero_copy_only=False).astype(np.float64),
            right_table.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64),
            right_table.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64),
        )
    )
    OUT = pa.schema([pa.field("l_key", pa.int64()), pa.field("r_key", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        rk, rminx, rminy, rmaxx, rmaxy = ray.get(r_ref)
        lk = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        lminx = batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float64)
        lminy = batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float64)
        lmaxx = batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64)
        lmaxy = batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64)
        out_l, out_r = [], []
        for s in range(0, len(lk), chunk):
            e = min(s + chunk, len(lk))
            hit = (
                (lminx[s:e, None] <= rmaxx[None, :])
                & (rminx[None, :] <= lmaxx[s:e, None])
                & (lminy[s:e, None] <= rmaxy[None, :])
                & (rminy[None, :] <= lmaxy[s:e, None])
            )
            li, ri = np.nonzero(hit)
            out_l.append(lk[s:e][li])
            out_r.append(rk[ri])
        l = np.concatenate(out_l) if out_l else np.empty(0, dtype=np.int64)
        r = np.concatenate(out_r) if out_r else np.empty(0, dtype=np.int64)
        return pa.table({"l_key": pa.array(l, pa.int64()), "r_key": pa.array(r, pa.int64())}).cast(OUT)

    return left_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bbox_overlap_join(
    left_ds,
    right_ds,
    *,
    cell: float,
    left_key: str = "key",
    right_key: str = "key",
    num_buckets: int = 64,
    cover_cap: int = 4096,
):
    """Distributed rectangle-intersection join → (l_key, r_key), every
    intersecting pair exactly once — BOTH sides Datasets, one shuffle,
    no driver materialization at ANY rectangle size (PBSM with
    reference-point dedup; see Patel & DeWitt, SIGMOD'96).

    Plan: each rectangle explodes to the grid cells (size ``cell``) its
    bbox covers and routes to ``hash(cell) % num_buckets``; candidate
    pairs form per exact cell inside each bucket (argsort + searchsorted
    range expansion, zero per-pair Python). A pair may share many cover
    cells, so each candidate is kept only in its REFERENCE-POINT cell —
    the cell containing (max(l.minx, r.minx), max(l.miny, r.miny)),
    a point inside the intersection, hence inside exactly one shared
    cell — which makes the output exactly-once by construction, with no
    dedup shuffle.

    Skew/scale guard: a rectangle whose cover exceeds ``cover_cap``
    cells skips cover enumeration and routes to EVERY bucket (≤
    ``num_buckets`` rows — a world-spanning rectangle costs 64 rows,
    not 10⁶). Big×normal candidates are tested against the normal
    side's exploded cells under the same reference-point rule;
    big×big pairs are claimed by the single bucket that owns the
    pair's reference-point cell. Replication bound per rectangle:
    ``min(cover, cover_cap, num_buckets … )`` rows on the wire.
    """
    from .util import splitmix64

    WIRE = pa.schema(
        [
            pa.field("bucket", pa.int32()),
            pa.field("cx", pa.int64()),
            pa.field("cy", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("big", pa.bool_()),
            pa.field("key", pa.int64()),
            pa.field("minx", pa.float64()),
            pa.field("miny", pa.float64()),
            pa.field("maxx", pa.float64()),
            pa.field("maxy", pa.float64()),
        ]
    )
    OUT = pa.schema([pa.field("l_key", pa.int64()), pa.field("r_key", pa.int64())])
    all_buckets = np.arange(num_buckets, dtype=np.int32)

    def make_explode(side_tag: int, key_col: str):
        def explode(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            minx = batch.column("minx").to_numpy(zero_copy_only=False).astype(np.float64)
            miny = batch.column("miny").to_numpy(zero_copy_only=False).astype(np.float64)
            maxx = batch.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64)
            maxy = batch.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64)
            ix0 = _grid_idx(minx, cell)
            ix1 = _grid_idx(maxx, cell)
            iy0 = _grid_idx(miny, cell)
            iy1 = _grid_idx(maxy, cell)
            # cover counted in float first: a degenerate/huge rect must
            # hit the big path before any int64 cell arithmetic can
            # overflow
            nxf = np.floor(maxx / cell) - np.floor(minx / cell) + 1.0
            nyf = np.floor(maxy / cell) - np.floor(miny / cell) + 1.0
            big = (nxf * nyf) > cover_cap
            nrm = np.flatnonzero(~big)
            _guard_i32(
                np.concatenate([ix0[nrm], ix1[nrm]]),
                np.concatenate([iy0[nrm], iy1[nrm]]),
                "bbox_overlap_join",
            )
            nx = (ix1[nrm] - ix0[nrm] + 1).astype(np.int64)
            ny = (iy1[nrm] - iy0[nrm] + 1).astype(np.int64)
            cnt = nx * ny
            rep, within = _range_expand(np.zeros(len(nrm), dtype=np.int64), cnt)
            rows_n = nrm[rep]
            cx_n = ix0[rows_n] + within // ny[rep]
            cy_n = iy0[rows_n] + within % ny[rep]
            bk_n = (splitmix64(_pack_cell(cx_n, cy_n)) % np.uint64(num_buckets)).astype(
                np.int32
            )
            # big rows: one copy per bucket, no cell identity
            brows = np.flatnonzero(big)
            rows_b = np.repeat(brows, num_buckets)
            bk_b = np.tile(all_buckets, len(brows))
            rows = np.concatenate([rows_n, rows_b])
            bks = np.concatenate([bk_n, bk_b])
            cxs = np.concatenate([cx_n, np.zeros(len(rows_b), dtype=np.int64)])
            cys = np.concatenate([cy_n, np.zeros(len(rows_b), dtype=np.int64)])
            bigf = np.concatenate(
                [np.zeros(len(rows_n), dtype=bool), np.ones(len(rows_b), dtype=bool)]
            )
            return pa.table(
                {
                    "bucket": pa.array(bks, pa.int32()),
                    "cx": pa.array(cxs, pa.int64()),
                    "cy": pa.array(cys, pa.int64()),
                    "side": pa.array(
                        np.full(len(rows), side_tag, dtype=np.int8), pa.int8()
                    ),
                    "big": pa.array(bigf, pa.bool_()),
                    "key": pa.array(k[rows], pa.int64()),
                    "minx": pa.array(minx[rows], pa.float64()),
                    "miny": pa.array(miny[rows], pa.float64()),
                    "maxx": pa.array(maxx[rows], pa.float64()),
                    "maxy": pa.array(maxy[rows], pa.float64()),
                }
            ).cast(WIRE)

        return explode

    lhs = left_ds.map_batches(
        make_explode(0, left_key), batch_format="pyarrow", zero_copy_batch=True
    )
    rhs = right_ds.map_batches(
        make_explode(1, right_key), batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy(zero_copy_only=False)
        big = t.column("big").to_numpy(zero_copy_only=False)
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        minx = t.column("minx").to_numpy(zero_copy_only=False)
        miny = t.column("miny").to_numpy(zero_copy_only=False)
        maxx = t.column("maxx").to_numpy(zero_copy_only=False)
        maxy = t.column("maxy").to_numpy(zero_copy_only=False)
        bucket_id = int(t.column("bucket")[0].as_py()) if len(t) else 0

        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []

        def overlap(li: np.ndarray, ri: np.ndarray) -> np.ndarray:
            return (
                (minx[li] <= maxx[ri])
                & (minx[ri] <= maxx[li])
                & (miny[li] <= maxy[ri])
                & (miny[ri] <= maxy[li])
            )

        def rp_cells(li: np.ndarray, ri: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            rpx = np.maximum(minx[li], minx[ri])
            rpy = np.maximum(miny[li], miny[ri])
            return _grid_idx(rpx, cell), _grid_idx(rpy, cell)

        # 1. normal × normal, per exact cell (probe = left rows, build =
        #    right rows argsorted by packed cell)
        nl = np.flatnonzero((side == 0) & ~big)
        nr = np.flatnonzero((side == 1) & ~big)
        if len(nl) and len(nr):
            pk = _pack_cell(cx, cy)
            order = nr[np.argsort(pk[nr], kind="stable")]
            pks = pk[order]
            lo = np.searchsorted(pks, pk[nl], side="left")
            hi = np.searchsorted(pks, pk[nl], side="right")
            li_idx, flat = _range_expand(lo, hi)
            if len(li_idx):
                li = nl[li_idx]
                ri = order[flat]
                keep = overlap(li, ri)
                li, ri = li[keep], ri[keep]
                rcx, rcy = rp_cells(li, ri)
                keep = (rcx == cx[li]) & (rcy == cy[li])
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        # 2./3. big × normal (either orientation): candidates = big rows ×
        #    the other side's exploded rows; the reference-point rule keeps
        #    the single exploded row whose cell owns the pair
        for big_side, nrm_rows in ((0, nr), (1, np.flatnonzero((side == 0) & ~big))):
            brows = np.flatnonzero((side == big_side) & big)
            if not len(brows) or not len(nrm_rows):
                continue
            for b in brows:
                bi = np.full(len(nrm_rows), b, dtype=np.int64)
                li, ri = (bi, nrm_rows) if big_side == 0 else (nrm_rows, bi)
                keep = overlap(li, ri)
                li, ri = li[keep], ri[keep]
                if not len(li):
                    continue
                rcx, rcy = rp_cells(li, ri)
                nrm = ri if big_side == 0 else li
                keep = (rcx == cx[nrm]) & (rcy == cy[nrm])
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        # 4. big × big: claimed by the bucket owning the pair's
        #    reference-point cell (each big row appears once per bucket,
        #    so candidates pair locally; the ownership test fires in
        #    exactly one bucket)
        bl = np.flatnonzero((side == 0) & big)
        br = np.flatnonzero((side == 1) & big)
        if len(bl) and len(br):
            li = np.repeat(bl, len(br))
            ri = np.tile(br, len(bl))
            keep = overlap(li, ri)
            li, ri = li[keep], ri[keep]
            if len(li):
                rcx, rcy = rp_cells(li, ri)
                owner = (
                    splitmix64(_pack_cell(rcx, rcy)) % np.uint64(num_buckets)
                ).astype(np.int32)
                keep = owner == bucket_id
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        if not out_l:
            return OUT.empty_table()
        return pa.table(
            {
                "l_key": pa.array(np.concatenate(out_l), pa.int64()),
                "r_key": pa.array(np.concatenate(out_r), pa.int64()),
            }
        ).cast(OUT)

    return lhs.union(rhs).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def _orient(ax, ay, bx, by, cx, cy):
    """2-D orientation cross product (b−a) × (c−a). Exact for
    integer-valued inputs within float64's 2⁵³ window (the query
    harness derives coordinates ≤ ~10⁴, products ≤ ~10⁸) and for
    int64 arrays outright."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _segments_intersect(lax, lay, lbx, lby, rax, ray_, rbx, rby) -> np.ndarray:
    """Vectorized segment-intersection predicate (endpoints inclusive):
    the classic two-sided orientation test plus the four collinear
    touch cases (CLRS §33.1 SEGMENTS-INTERSECT, public algorithm)."""
    d1 = _orient(rax, ray_, rbx, rby, lax, lay)
    d2 = _orient(rax, ray_, rbx, rby, lbx, lby)
    d3 = _orient(lax, lay, lbx, lby, rax, ray_)
    d4 = _orient(lax, lay, lbx, lby, rbx, rby)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

    def onseg(ax, ay, bx, by, px, py):
        return (
            (np.minimum(ax, bx) <= px)
            & (px <= np.maximum(ax, bx))
            & (np.minimum(ay, by) <= py)
            & (py <= np.maximum(ay, by))
        )

    touch = (
        ((d1 == 0) & onseg(rax, ray_, rbx, rby, lax, lay))
        | ((d2 == 0) & onseg(rax, ray_, rbx, rby, lbx, lby))
        | ((d3 == 0) & onseg(lax, lay, lbx, lby, rax, ray_))
        | ((d4 == 0) & onseg(lax, lay, lbx, lby, rbx, rby))
    )
    return proper | touch


_SEG_COLS = ("ax", "ay", "bx", "by")


def segment_intersection_join_broadcast(
    left_ds,
    right_table: pa.Table,
    *,
    left_key: str = "key",
    right_key: str = "key",
    chunk: int = 2048,
):
    """left segments Dataset ⋈ right segments Table on exact segment
    intersection (endpoints inclusive) → (l_key, r_key). Broadcast
    strategy — right side ships once via the object store; per left
    batch a chunked bbox prefilter then the exact orientation test.
    Partitioning assumption: right fits one worker; the scale path is
    :func:`segment_intersection_join` (property-tested equal)."""
    cols = tuple(
        right_table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        for c in _SEG_COLS
    )
    r_ref = ray.put(
        (
            right_table.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64),
            *cols,
        )
    )
    OUT = pa.schema([pa.field("l_key", pa.int64()), pa.field("r_key", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        rk, rax, ray_, rbx, rby = ray.get(r_ref)
        rminx, rmaxx = np.minimum(rax, rbx), np.maximum(rax, rbx)
        rminy, rmaxy = np.minimum(ray_, rby), np.maximum(ray_, rby)
        lk = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        lax, lay, lbx, lby = (
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in _SEG_COLS
        )
        lminx, lmaxx = np.minimum(lax, lbx), np.maximum(lax, lbx)
        lminy, lmaxy = np.minimum(lay, lby), np.maximum(lay, lby)
        out_l, out_r = [], []
        for s in range(0, len(lk), chunk):
            e = min(s + chunk, len(lk))
            hit = (
                (lminx[s:e, None] <= rmaxx[None, :])
                & (rminx[None, :] <= lmaxx[s:e, None])
                & (lminy[s:e, None] <= rmaxy[None, :])
                & (rminy[None, :] <= lmaxy[s:e, None])
            )
            li, ri = np.nonzero(hit)
            li = li + s
            if len(li):
                keep = _segments_intersect(
                    lax[li], lay[li], lbx[li], lby[li],
                    rax[ri], ray_[ri], rbx[ri], rby[ri],
                )
                out_l.append(lk[li[keep]])
                out_r.append(rk[ri[keep]])
        l = np.concatenate(out_l) if out_l else np.empty(0, dtype=np.int64)
        r = np.concatenate(out_r) if out_r else np.empty(0, dtype=np.int64)
        return pa.table(
            {"l_key": pa.array(l, pa.int64()), "r_key": pa.array(r, pa.int64())}
        ).cast(OUT)

    return left_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def segment_intersection_join(
    left_ds,
    right_ds,
    *,
    cell: float,
    left_key: str = "key",
    right_key: str = "key",
    num_buckets: int = 64,
    cover_cap: int = 4096,
):
    """Distributed exact segment-intersection join → (l_key, r_key),
    every intersecting pair exactly once — BOTH sides Datasets, one
    shuffle, no driver materialization at any segment length.

    Same PBSM + reference-point plan as :func:`bbox_overlap_join`
    (grid-cell explode on the segment's bbox, hash-bucket shuffle,
    candidate pairs per exact cell, pair claimed only by the cell
    owning (max minx, max miny) of the bbox intersection, long
    segments past ``cover_cap`` cells ride the all-bucket route), with
    the exact CLRS orientation predicate applied after the bbox
    prefilter inside each bucket. The reference-point rule is sound
    here because it only requires a deterministic function of the two
    bboxes that lands in a shared cover cell — independence from the
    exact predicate is what lets one plan serve boxes, segments, and
    any other bbox-bounded geometry.
    """
    from .util import splitmix64

    WIRE = pa.schema(
        [
            pa.field("bucket", pa.int32()),
            pa.field("cx", pa.int64()),
            pa.field("cy", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("big", pa.bool_()),
            pa.field("key", pa.int64()),
            pa.field("ax", pa.float64()),
            pa.field("ay", pa.float64()),
            pa.field("bx", pa.float64()),
            pa.field("by", pa.float64()),
        ]
    )
    OUT = pa.schema([pa.field("l_key", pa.int64()), pa.field("r_key", pa.int64())])
    all_buckets = np.arange(num_buckets, dtype=np.int32)

    def make_explode(side_tag: int, key_col: str):
        def explode(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ax, ay, bx, by = (
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in _SEG_COLS
            )
            minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
            miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
            ix0, ix1 = _grid_idx(minx, cell), _grid_idx(maxx, cell)
            iy0, iy1 = _grid_idx(miny, cell), _grid_idx(maxy, cell)
            nxf = np.floor(maxx / cell) - np.floor(minx / cell) + 1.0
            nyf = np.floor(maxy / cell) - np.floor(miny / cell) + 1.0
            big = (nxf * nyf) > cover_cap
            nrm = np.flatnonzero(~big)
            _guard_i32(
                np.concatenate([ix0[nrm], ix1[nrm]]),
                np.concatenate([iy0[nrm], iy1[nrm]]),
                "segment_intersection_join",
            )
            nx = (ix1[nrm] - ix0[nrm] + 1).astype(np.int64)
            ny = (iy1[nrm] - iy0[nrm] + 1).astype(np.int64)
            rep, within = _range_expand(np.zeros(len(nrm), dtype=np.int64), nx * ny)
            rows_n = nrm[rep]
            cx_n = ix0[rows_n] + within // ny[rep]
            cy_n = iy0[rows_n] + within % ny[rep]
            bk_n = (splitmix64(_pack_cell(cx_n, cy_n)) % np.uint64(num_buckets)).astype(
                np.int32
            )
            brows = np.flatnonzero(big)
            rows_b = np.repeat(brows, num_buckets)
            bk_b = np.tile(all_buckets, len(brows))
            rows = np.concatenate([rows_n, rows_b])
            bks = np.concatenate([bk_n, bk_b])
            cxs = np.concatenate([cx_n, np.zeros(len(rows_b), dtype=np.int64)])
            cys = np.concatenate([cy_n, np.zeros(len(rows_b), dtype=np.int64)])
            bigf = np.concatenate(
                [np.zeros(len(rows_n), dtype=bool), np.ones(len(rows_b), dtype=bool)]
            )
            return pa.table(
                {
                    "bucket": pa.array(bks, pa.int32()),
                    "cx": pa.array(cxs, pa.int64()),
                    "cy": pa.array(cys, pa.int64()),
                    "side": pa.array(
                        np.full(len(rows), side_tag, dtype=np.int8), pa.int8()
                    ),
                    "big": pa.array(bigf, pa.bool_()),
                    "key": pa.array(k[rows], pa.int64()),
                    "ax": pa.array(ax[rows], pa.float64()),
                    "ay": pa.array(ay[rows], pa.float64()),
                    "bx": pa.array(bx[rows], pa.float64()),
                    "by": pa.array(by[rows], pa.float64()),
                }
            ).cast(WIRE)

        return explode

    lhs = left_ds.map_batches(
        make_explode(0, left_key), batch_format="pyarrow", zero_copy_batch=True
    )
    rhs = right_ds.map_batches(
        make_explode(1, right_key), batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy(zero_copy_only=False)
        big = t.column("big").to_numpy(zero_copy_only=False)
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        ax, ay, bx, by = (
            t.column(c).to_numpy(zero_copy_only=False) for c in _SEG_COLS
        )
        minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
        miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
        bucket_id = int(t.column("bucket")[0].as_py()) if len(t) else 0

        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []

        def matches(li: np.ndarray, ri: np.ndarray) -> np.ndarray:
            pre = (
                (minx[li] <= maxx[ri])
                & (minx[ri] <= maxx[li])
                & (miny[li] <= maxy[ri])
                & (miny[ri] <= maxy[li])
            )
            out = np.zeros(len(li), dtype=bool)
            c = np.flatnonzero(pre)
            if len(c):
                out[c] = _segments_intersect(
                    ax[li[c]], ay[li[c]], bx[li[c]], by[li[c]],
                    ax[ri[c]], ay[ri[c]], bx[ri[c]], by[ri[c]],
                )
            return out

        def rp_cells(li: np.ndarray, ri: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            rpx = np.maximum(minx[li], minx[ri])
            rpy = np.maximum(miny[li], miny[ri])
            return _grid_idx(rpx, cell), _grid_idx(rpy, cell)

        nl = np.flatnonzero((side == 0) & ~big)
        nr = np.flatnonzero((side == 1) & ~big)
        if len(nl) and len(nr):
            pk = _pack_cell(cx, cy)
            order = nr[np.argsort(pk[nr], kind="stable")]
            pks = pk[order]
            lo = np.searchsorted(pks, pk[nl], side="left")
            hi = np.searchsorted(pks, pk[nl], side="right")
            li_idx, flat = _range_expand(lo, hi)
            if len(li_idx):
                li = nl[li_idx]
                ri = order[flat]
                keep = matches(li, ri)
                li, ri = li[keep], ri[keep]
                rcx, rcy = rp_cells(li, ri)
                keep = (rcx == cx[li]) & (rcy == cy[li])
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        for big_side, nrm_rows in ((0, nr), (1, np.flatnonzero((side == 0) & ~big))):
            brows = np.flatnonzero((side == big_side) & big)
            if not len(brows) or not len(nrm_rows):
                continue
            for b in brows:
                bi = np.full(len(nrm_rows), b, dtype=np.int64)
                li, ri = (bi, nrm_rows) if big_side == 0 else (nrm_rows, bi)
                keep = matches(li, ri)
                li, ri = li[keep], ri[keep]
                if not len(li):
                    continue
                rcx, rcy = rp_cells(li, ri)
                nrm = ri if big_side == 0 else li
                keep = (rcx == cx[nrm]) & (rcy == cy[nrm])
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        bl = np.flatnonzero((side == 0) & big)
        br = np.flatnonzero((side == 1) & big)
        if len(bl) and len(br):
            li = np.repeat(bl, len(br))
            ri = np.tile(br, len(bl))
            keep = matches(li, ri)
            li, ri = li[keep], ri[keep]
            if len(li):
                rcx, rcy = rp_cells(li, ri)
                owner = (
                    splitmix64(_pack_cell(rcx, rcy)) % np.uint64(num_buckets)
                ).astype(np.int32)
                keep = owner == bucket_id
                out_l.append(key[li[keep]])
                out_r.append(key[ri[keep]])

        if not out_l:
            return OUT.empty_table()
        return pa.table(
            {
                "l_key": pa.array(np.concatenate(out_l), pa.int64()),
                "r_key": pa.array(np.concatenate(out_r), pa.int64()),
            }
        ).cast(OUT)

    return lhs.union(rhs).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
