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

        bbox prefilter (vectorized) then exact even-odd ray casting per
        candidate polygon over its candidate points only.
        """
        out_pt, out_poly = [], []
        for p in range(len(self.poly_ids)):
            b = self.bboxes[p]
            cand = np.flatnonzero((px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3]))
            if len(cand) == 0:
                continue
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
