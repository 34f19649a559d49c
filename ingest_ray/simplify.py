"""Polyline simplification (Ramer–Douglas–Peucker) — the low-zoom
geometry reduction a tile store wants before rendering small scales
(the reference stores full-resolution georender payloads per tile;
a zoom pyramid over them needs exactly this pass).

Embarrassingly parallel: one ``map_batches`` stage, no shuffle — each
feature's positions list is simplified independently, so the operator
composes with the tile pipeline at any point. The per-feature driver
loop is an explicit stack; every distance evaluation inside it is a
vectorized numpy kernel over the whole sub-range (the same
per-feature/vector-inner split as the earcut encoder, geom.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask over one polyline's vertices. Endpoints always
    kept; a vertex is dropped when its perpendicular distance to the
    current recursion chord is ≤ ``eps`` (strictly-greater splits, so
    eps=0 keeps every vertex off its chord and drops exact collinear
    duplicates — the conventional RDP contract)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    e2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        xs = x[a + 1 : b]
        ys = y[a + 1 : b]
        dx, dy = x[b] - x[a], y[b] - y[a]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (xs - x[a]) ** 2 + (ys - y[a]) ** 2
        else:
            # squared distance to the INFINITE line through the chord,
            # clamped to the segment (standard point-segment distance)
            t = ((xs - x[a]) * dx + (ys - y[a]) * dy) / L2
            t = np.clip(t, 0.0, 1.0)
            px = x[a] + t * dx
            py = y[a] + t * dy
            d2 = (xs - px) ** 2 + (ys - py) ** 2
        i = int(np.argmax(d2))
        if d2[i] > e2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_positions_batch(batch: pa.Table, eps: float) -> pa.Table:
    """Simplify every row's interleaved (lon, lat, …) ``positions``
    list; other columns pass through. Adds ``n_pts`` / ``n_kept``."""
    pos = batch.column("positions")
    if isinstance(pos, pa.ChunkedArray):
        pos = pos.combine_chunks()
    off = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pos.values.to_numpy(zero_copy_only=False).astype(np.float64)
    keep_parts: list[np.ndarray] = []
    counts = np.empty(len(batch), dtype=np.int64)
    kept = np.empty(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        seg = flat[off[i] : off[i + 1]]
        x, y = seg[0::2], seg[1::2]
        mask = dp_keep_mask(x, y, eps)
        keep_parts.append(mask)
        counts[i] = len(x)
        kept[i] = int(mask.sum())
    if keep_parts:
        flat_keep = np.repeat(np.concatenate(keep_parts), 2)
        new_vals = pos.values.take(
            pa.array(np.flatnonzero(flat_keep).astype(np.int64), pa.int64())
        )
    else:
        new_vals = pos.values.slice(0, 0)
    new_offs = np.concatenate([[0], np.cumsum(kept * 2)]).astype(np.int32)
    new_pos = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), new_vals)
    cols = {c: batch.column(c) for c in batch.column_names if c != "positions"}
    cols["positions"] = new_pos
    cols["n_pts"] = pa.array(counts, pa.int64())
    cols["n_kept"] = pa.array(kept, pa.int64())
    return pa.table(cols)


def simplify_lines(features_ds, *, eps: float):
    """features Dataset → same rows with RDP-simplified ``positions``
    (original vertices only — a subsequence, never new coordinates —
    so downstream f32 goldens stay exact on kept points)."""

    def fn(batch: pa.Table) -> pa.Table:
        return simplify_positions_batch(batch, eps)

    return features_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
