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
        minx..maxy) — only area features (kind==3) are meaningful."""
        ids = table.column("key").to_numpy(zero_copy_only=False)
        pos = table.column("positions")
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        ring = table.column("ring_offsets")
        if isinstance(ring, pa.ChunkedArray):
            ring = ring.combine_chunks()
        values = []
        offsets = [0]
        spans = []
        pos_l = pos.to_pylist()
        ring_l = ring.to_pylist()
        for i in range(len(ids)):
            p = pos_l[i] or []
            r = ring_l[i] or [0, len(p) // 2]
            start_ring = len(offsets) - 1
            base = offsets[-1]
            for k in range(1, len(r)):
                offsets.append(base + r[k])
            values.append(np.asarray(p, dtype=np.float64))
            spans.append((start_ring, start_ring + len(r) - 1))
        vals = np.concatenate(values) if values else np.empty(0)
        bboxes = np.column_stack(
            [
                table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in ("minx", "miny", "maxx", "maxy")
            ]
        ) if len(ids) else np.empty((0, 4))
        return cls(ids, vals, np.asarray(offsets), np.asarray(spans).reshape(-1, 2), bboxes)

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
    kernel. Partitioning assumption: the polygon side fits one worker
    (for the planet-scale path, pre-partition both sides by tile_cell
    and run this per cell — same kernel, cell-local polygon sets).
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
        order = np.argsort(cells, kind="stable")
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
        out_q, out_n, out_d, out_rank = [], [], [], []
        cells = hex_cell(qx, qy, self.res)
        for i in range(len(qx)):
            ring = 1
            cand = np.empty(0, dtype=np.int64)
            while ring <= self.max_ring:
                flat, _ = hex_k_rings_batch(cells[i : i + 1], ring)
                cand = self.index.candidates(np.unique(flat))
                if len(cand) >= self.k:
                    # one extra ring so the true top-k can't hide just
                    # outside the searched ring boundary
                    flat, _ = hex_k_rings_batch(cells[i : i + 1], ring + 1)
                    cand = self.index.candidates(np.unique(flat))
                    break
                ring += 1
            if len(cand) == 0:
                continue
            dx = self.index.xs[cand] - qx[i]
            dy = self.index.ys[cand] - qy[i]
            d2 = dx * dx + dy * dy
            kk = min(self.k, len(cand))
            top = np.argpartition(d2, kk - 1)[:kk]
            top = top[np.argsort(d2[top], kind="stable")]
            out_q.append(np.full(kk, qid[i]))
            out_n.append(self.index.ids[cand[top]])
            out_d.append(np.sqrt(d2[top]))
            out_rank.append(np.arange(kk, dtype=np.int32))
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int32()),
                }
            )
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
