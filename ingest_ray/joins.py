"""Distributed reference resolution — the engine's join layer.

Ray-Data-native re-expression of the reference's streaming hash joins
(/root/reference/src/denorm.rs:366-436 and the batched loops at
/root/reference/src/lib.rs:194-260, 286-386):

* way→node  (J1+J3): explode way refs → (node_id, way_id, pos) rows,
  join against the node table on ``node_id``, regroup per way with ref
  order preserved (``pos``) — order is semantic (ring winding,
  SURVEY.md §7.5).
* relation→way→node (J5+J7): two chained hash joins — member rows ⋈
  exploded way refs on ``way_id``, then ⋈ nodes on ``node_id`` —
  regrouped per relation with (member pos, ref pos) preserved.

Design note (scale): way/relation *metadata* (feature type, labels,
provenance) rides the same shuffle as the exploded refs, attached only
to each key's ``pos==0`` row (nulls elsewhere). That removes the
second "join the lists back to the parent" exchange entirely — and
sidesteps Acero's restriction that list-typed columns cannot be
non-key join fields. Unresolved refs are kept (left joins, NaN
coords): ring stitching sees the full ref sequence and coordinates are
skipped only at position-emit time, matching src/lib.rs:348-353.

Two execution strategies per node lookup, chosen by ``mode``:

* ``"shuffle"``   — ``Dataset.join`` (hash-partitioned), scales to
  planet-size inputs.
* ``"broadcast"`` — the node side is collected into sorted numpy
  arrays, ``ray.put`` ONCE, and every map task does vectorized
  ``searchsorted`` lookups (city-extract sized inputs; no shuffle).
* ``"auto"``      — broadcast below ``broadcast_limit`` rows.

Regrouping avoids per-group Python dispatch: rows are bucketed by
``hash(key) % num_buckets`` and each *bucket* is reassembled in one
vectorized numpy pass (lexsort + unique segment offsets), so Python
overhead is O(buckets), not O(keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import effective_num_partitions, splitmix64, tune_shuffle_context

DEFAULT_BROADCAST_LIMIT = 250_000_000  # see EngineConfig.broadcast_limit


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _list_offsets(col) -> tuple[np.ndarray, pa.Array]:
    """(normalized offsets, flat values) of a list column.

    Offsets are re-based to 0 so they align with ``flatten()`` even on
    sliced arrays (a sliced ListArray keeps its parent's offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False)
    return off - off[0], col.flatten()


# --------------------------------------------------------------------------
# broadcast lookup side (SURVEY.md §2.6 ST2-style shared read-only state)
# --------------------------------------------------------------------------


class BroadcastIndex:
    """Sorted-array (id → payloads) lookup shipped once via ray.put."""

    def __init__(self, ids: np.ndarray, *payloads: np.ndarray):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.payloads = [p[order] for p in payloads]

    def lookup(self, keys: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
        if len(self.ids) == 0:
            found = np.zeros(len(keys), dtype=bool)
            return found, [np.zeros(len(keys), dtype=p.dtype) for p in self.payloads]
        idx = np.searchsorted(self.ids, keys)
        idx_c = np.clip(idx, 0, len(self.ids) - 1)
        found = (idx < len(self.ids)) & (self.ids[idx_c] == keys)
        return found, [p[idx_c] for p in self.payloads]


def build_node_index(nodes_ds) -> "ray.ObjectRef":
    """Collect (id, lon, lat) into a BroadcastIndex ref (pruned read)."""
    tbls = list(
        nodes_ds.select_columns(["id", "lon", "lat"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    t = (
        pa.concat_tables(tbls)
        if tbls
        else pa.table({"id": pa.array([], pa.int64()), "lon": pa.array([], pa.float32()), "lat": pa.array([], pa.float32())})
    )
    return ray.put(
        BroadcastIndex(
            np.asarray(_np(t.column("id")), dtype=np.int64),
            np.asarray(_np(t.column("lon")), dtype=np.float32),
            np.asarray(_np(t.column("lat")), dtype=np.float32),
        )
    )


_SHARD_CACHE: dict = {}  # per-worker-process shard cache (ref hex → arrays)
_SHARD_CACHE_CAP = 512  # bound pinned plasma views (FIFO eviction; an
# unbounded cache pins every index block ever touched for the worker's
# lifetime — long-lived clusters running successive pipelines/changesets
# would accumulate object-store memory until spill/OOM)


def _shard_cache_put(key, value):
    if len(_SHARD_CACHE) >= _SHARD_CACHE_CAP:
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    _SHARD_CACHE[key] = value


@ray.remote(num_cpus=0.25)
def _block_id_range(tbl: pa.Table) -> tuple[int, int]:
    if len(tbl) == 0:
        return (2**63 - 1, -(2**63))
    ids = tbl.column("id").to_numpy(zero_copy_only=False)
    return (int(ids.min()), int(ids.max()))


class ShardedNodeIndex:
    """Zone-map ``id → (lon, lat)`` index over materialized blocks.

    The reference's ScanTable (/root/reference/src/par_scan.rs:60-85:
    per-blob id interval → blob offset) mapped to Ray: the index holds
    only the node blocks' object refs + each block's (min, max) id —
    NO sort, no driver collect; OSM ids ascend within a corpus so
    block ranges barely overlap. Workers ``ray.get`` the blocks a
    batch touches (plasma zero-copy; one physical copy per machine),
    argsort each block once on first touch, and cache per process.
    Build cost = one tiny min/max task per block, fully parallel.
    """

    def __init__(self, block_refs: list, mins: np.ndarray, maxs: np.ndarray):
        order = np.argsort(mins, kind="stable")
        self.block_refs = [block_refs[i] for i in order]
        self.mins = mins[order]
        self.maxs = maxs[order]

    ekind: int | None = None  # set → blocks are mixed-kind; filter at first touch

    def _shard(self, b: int):
        ref = self.block_refs[b]
        key = ref.hex() if self.ekind is None else f"n{self.ekind}" + ref.hex()
        got = _SHARD_CACHE.get(key)
        if got is None:
            tbl = ray.get(ref)
            if self.ekind is not None:
                # contiguous-run slice, NOT a filter: a filter copies the
                # node coords per worker process (anti-scaling at 32 CPUs)
                from .elements import kind_segment

                tbl = kind_segment(tbl, self.ekind).select(["id", "lon", "lat"])
            ids = np.asarray(tbl.column("id").to_numpy(zero_copy_only=False), dtype=np.int64)
            lon = tbl.column("lon").to_numpy(zero_copy_only=False)
            lat = tbl.column("lat").to_numpy(zero_copy_only=False)
            # OSM ids ascend within a corpus, so blocks are almost
            # always pre-sorted: keep zero-copy plasma views. A sorted
            # COPY per worker would cost (index size × num workers) in
            # memory and CPU — measured as the anti-scaling term of the
            # whole encode stage.
            if len(ids) > 1 and not bool(np.all(ids[1:] >= ids[:-1])):
                srt = np.argsort(ids, kind="stable")
                ids, lon, lat = ids[srt], lon[srt], lat[srt]
            got = (ids, lon, lat)
            _shard_cache_put(key, got)
        return got

    def lookup(self, keys: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
        n = len(keys)
        found = np.zeros(n, dtype=bool)
        lon = np.full(n, np.nan, dtype=np.float32)
        lat = np.full(n, np.nan, dtype=np.float32)
        if not self.block_refs or n == 0:
            return found, [lon, lat]
        # primary-block fast path: blocks sorted by min, so the last
        # block with min ≤ key is each key's best candidate — one
        # searchsorted instead of an O(n_blocks × batch) mask sweep
        # (zone maps barely overlap: OSM ids ascend through a corpus)
        prim = np.searchsorted(self.mins, keys, side="right") - 1
        in_prim = (prim >= 0) & (keys <= self.maxs[np.clip(prim, 0, None)])
        for b in np.unique(prim[in_prim]):
            sel = np.flatnonzero(in_prim & (prim == b))
            ids, slon, slat = self._shard(int(b))
            k = keys[sel]
            idx = np.searchsorted(ids, k)
            idx_c = np.clip(idx, 0, len(ids) - 1)
            hit = (idx < len(ids)) & (ids[idx_c] == k)
            hs = sel[hit]
            lon[hs] = slon[idx_c[hit]]
            lat[hs] = slat[idx_c[hit]]
            found[hs] = True
        # overlap fallback: keys inside an earlier overlapping block's
        # range — rare; the per-block candidate sweep only touches
        # blocks whose [min, max] still contains an unresolved key
        if not found.all():
            miss = ~found
            for b in range(len(self.block_refs)):
                cand = miss & (keys >= self.mins[b]) & (keys <= self.maxs[b])
                cand &= prim != b
                if not cand.any():
                    continue
                sel = np.flatnonzero(cand)
                ids, slon, slat = self._shard(b)
                k = keys[sel]
                idx = np.searchsorted(ids, k)
                idx_c = np.clip(idx, 0, len(ids) - 1)
                hit = (idx < len(ids)) & (ids[idx_c] == k)
                hs = sel[hit]
                lon[hs] = slon[idx_c[hit]]
                lat[hs] = slat[idx_c[hit]]
                found[hs] = True
                miss[hs] = False
        return found, [lon, lat]


def build_node_index_sharded(nodes_ds) -> "ray.ObjectRef":
    """Zone-map build: keep materialized blocks in the object store;
    fetch only each block's (min, max) id to the driver."""
    refs = nodes_ds.select_columns(["id", "lon", "lat"]).to_arrow_refs()
    ranges = ray.get([_block_id_range.remote(r) for r in refs])
    mins = np.array([r[0] for r in ranges], dtype=np.int64)
    maxs = np.array([r[1] for r in ranges], dtype=np.int64)
    keep = mins <= maxs
    refs = [refs[i] for i in np.flatnonzero(keep)]
    return ray.put(ShardedNodeIndex(refs, mins[keep], maxs[keep]))


SHARDED_INDEX_THRESHOLD = 4_000_000  # driver collect below, distributed above


def build_node_index_auto(nodes_ds) -> "ray.ObjectRef":
    try:
        big = nodes_ds.count() > SHARDED_INDEX_THRESHOLD
    except Exception:
        big = True  # size unknown: the sharded (zone-map) index is safe
        # at any size; driver collect is only safe when provably small
    return build_node_index_sharded(nodes_ds) if big else build_node_index(nodes_ds)


class WayRefsIndex:
    """Sorted-array ``way_id → refs-span`` lookup (broadcast side of
    the relation two-hop join — the analog of the reference's bare-way
    stream into ``way_deps``, /root/reference/src/denorm.rs:409-421)."""

    def __init__(self, ids: np.ndarray, offsets: np.ndarray, flat: np.ndarray):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.starts = offsets[:-1][order]
        self.counts = np.diff(offsets)[order]
        self.flat = flat

    def lookup_refs(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """→ (found, counts, gathered_refs): each found key's refs,
        concatenated in key order."""
        n = len(keys)
        if len(self.ids) == 0:
            z = np.zeros(n, dtype=np.int64)
            return np.zeros(n, dtype=bool), z, np.empty(0, dtype=np.int64)
        idx = np.searchsorted(self.ids, keys)
        idx_c = np.clip(idx, 0, len(self.ids) - 1)
        found = (idx < len(self.ids)) & (self.ids[idx_c] == keys)
        counts = np.where(found, self.counts[idx_c], 0).astype(np.int64)
        total = int(counts.sum())
        first_of = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(first_of, counts)
        src = np.repeat(np.where(found, self.starts[idx_c], 0), counts) + within
        return found, counts, self.flat[src]


class ShardedWayRefsIndex:
    """Zone-map ``way_id → refs`` index over materialized way blocks —
    same ScanTable pattern as :class:`ShardedNodeIndex`, list payload.
    Workers cache (ids, starts, counts, flat) per block zero-copy."""

    def __init__(self, block_refs: list, mins: np.ndarray, maxs: np.ndarray):
        order = np.argsort(mins, kind="stable")
        self.block_refs = [block_refs[i] for i in order]
        self.mins = mins[order]
        self.maxs = maxs[order]

    ekind: int | None = None  # set → blocks are mixed-kind; filter at first touch

    def _shard(self, b: int):
        ref = self.block_refs[b]
        key = ("w" if self.ekind is None else f"w{self.ekind}") + ref.hex()
        got = _SHARD_CACHE.get(key)
        if got is None:
            tbl = ray.get(ref)
            if self.ekind is not None:
                # contiguous-run slice, NOT a filter (see ShardedNodeIndex)
                from .elements import kind_segment

                tbl = kind_segment(tbl, self.ekind).select(["id", "refs"])
            ids = np.asarray(tbl.column("id").to_numpy(zero_copy_only=False), dtype=np.int64)
            off, flat_arr = _list_offsets(tbl.column("refs"))
            flat = np.asarray(flat_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
            starts = off[:-1].astype(np.int64)
            counts = np.diff(off).astype(np.int64)
            if len(ids) > 1 and not bool(np.all(ids[1:] >= ids[:-1])):
                srt = np.argsort(ids, kind="stable")
                ids, starts, counts = ids[srt], starts[srt], counts[srt]
            got = (ids, starts, counts, flat)
            _shard_cache_put(key, got)
        return got

    def _probe(self, b: int, keys, sel, found, counts, loc_block, loc_start) -> None:
        ids, starts, cnts, _flat = self._shard(b)
        k = keys[sel]
        idx = np.searchsorted(ids, k)
        idx_c = np.clip(idx, 0, len(ids) - 1)
        hit = (idx < len(ids)) & (ids[idx_c] == k)
        hs = sel[hit]
        found[hs] = True
        counts[hs] = cnts[idx_c[hit]]
        loc_block[hs] = b
        loc_start[hs] = starts[idx_c[hit]]

    def lookup_refs(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = len(keys)
        found = np.zeros(n, dtype=bool)
        counts = np.zeros(n, dtype=np.int64)
        loc_block = np.zeros(n, dtype=np.int64)
        loc_start = np.zeros(n, dtype=np.int64)
        if not self.block_refs or n == 0:
            return found, counts, np.empty(0, dtype=np.int64)
        # primary-block fast path + overlap fallback (see
        # ShardedNodeIndex.lookup for the zone-map argument)
        prim = np.searchsorted(self.mins, keys, side="right") - 1
        in_prim = (prim >= 0) & (keys <= self.maxs[np.clip(prim, 0, None)])
        for b in np.unique(prim[in_prim]):
            self._probe(int(b), keys, np.flatnonzero(in_prim & (prim == b)), found, counts, loc_block, loc_start)
        if not found.all():
            for b in range(len(self.block_refs)):
                cand = (~found) & (keys >= self.mins[b]) & (keys <= self.maxs[b]) & (prim != b)
                if not cand.any():
                    continue
                self._probe(b, keys, np.flatnonzero(cand), found, counts, loc_block, loc_start)
        total = int(counts.sum())
        out = np.empty(total, dtype=np.int64)
        first_of = np.cumsum(counts) - counts
        for b in np.unique(loc_block[found]):
            selk = np.flatnonzero(found & (loc_block == b))
            c = counts[selk]
            tot_b = int(c.sum())
            if tot_b == 0:
                continue
            fo = np.cumsum(c) - c
            within = np.arange(tot_b, dtype=np.int64) - np.repeat(fo, c)
            src = np.repeat(loc_start[selk], c) + within
            dst = np.repeat(first_of[selk], c) + within
            flat = self._shard(int(b))[3]
            out[dst] = flat[src]
        return found, counts, out


def build_way_refs_index_sharded(ways_ds) -> "ray.ObjectRef":
    """Zone-map build over (id, refs) blocks — no driver collect."""
    refs = ways_ds.select_columns(["id", "refs"]).to_arrow_refs()
    ranges = ray.get([_block_id_range.remote(r) for r in refs])
    mins = np.array([r[0] for r in ranges], dtype=np.int64)
    maxs = np.array([r[1] for r in ranges], dtype=np.int64)
    keep = mins <= maxs
    refs = [refs[i] for i in np.flatnonzero(keep)]
    return ray.put(ShardedWayRefsIndex(refs, mins[keep], maxs[keep]))


@ray.remote(num_cpus=0.25)
def _block_kind_ranges(tbl: pa.Table):
    """Per-kind (min, max) id of a mixed-kind element block plus the
    block's per-kind row counts (one task serves BOTH index builds AND
    the relation-branch sizing, so the pipeline needs no separate
    count execution)."""
    import pyarrow.compute as pc

    out = []
    ek = tbl.column("ekind")
    for kind in (0, 1):
        ids = tbl.filter(pc.equal(ek, kind)).column("id")
        if len(ids) == 0:
            out.append((2**63 - 1, -(2**63)))
        else:
            arr = ids.to_numpy(zero_copy_only=False)
            out.append((int(arr.min()), int(arr.max())))
    ekn = ek.to_numpy(zero_copy_only=False)
    counts = np.bincount(ekn, minlength=3)
    out.append((int(counts[0]), int(counts[1]), int(counts[2])))
    return out


def build_sharded_indexes_from_all(all_el, want_way_index: bool = True, return_counts: bool = False):
    """ONE sweep over the materialized union element blocks → kind-aware
    sharded node and way-refs indexes → (node_ref, way_ref | None).

    The per-kind builders each re-execute the kind_view filtered
    projection over every block (a whole Dataset execution per index,
    ~2.6s of fixed cost each at any CPU count). Here the zone maps come
    from one parallel min/max sweep over the ALREADY materialized
    blocks, and the kind filter happens lazily at worker first touch
    (cached per (kind, block) — see ``_shard``).
    """
    refs = all_el.to_arrow_refs()
    ranges = ray.get([_block_kind_ranges.remote(r) for r in refs])

    def mk(cls, kind_idx: int, ekind: int):
        mins = np.array([r[kind_idx][0] for r in ranges], dtype=np.int64)
        maxs = np.array([r[kind_idx][1] for r in ranges], dtype=np.int64)
        keep = mins <= maxs
        blocks = [refs[i] for i in np.flatnonzero(keep)]
        idx = cls(blocks, mins[keep], maxs[keep])
        idx.ekind = ekind
        return ray.put(idx)

    node_ref = mk(ShardedNodeIndex, 0, 0)
    way_ref = mk(ShardedWayRefsIndex, 1, 1) if want_way_index else None
    if return_counts:
        kind_counts = tuple(int(sum(r[2][k] for r in ranges)) for k in range(3))
        return node_ref, way_ref, kind_counts
    return node_ref, way_ref


def build_way_refs_index_auto(ways_ds) -> "ray.ObjectRef":
    try:
        big = ways_ds.count() > SHARDED_INDEX_THRESHOLD
    except Exception:
        big = True  # see build_node_index_auto
    return build_way_refs_index_sharded(ways_ds) if big else build_way_refs_index(ways_ds)


def build_way_refs_index(ways_ds) -> "ray.ObjectRef":
    """Collect (id, refs) into a WayRefsIndex ref (pruned read)."""
    tbls = list(
        ways_ds.select_columns(["id", "refs"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    if tbls:
        t = pa.concat_tables(tbls)
        offsets, flat = _list_offsets(t.column("refs"))
        ids = np.asarray(_np(t.column("id")), dtype=np.int64)
        flat_np = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=np.int64)
    else:
        ids = np.empty(0, dtype=np.int64)
        offsets = np.zeros(1, dtype=np.int64)
        flat_np = np.empty(0, dtype=np.int64)
    return ray.put(WayRefsIndex(ids, np.asarray(offsets, dtype=np.int64), flat_np))


def _estimate_small(ds, limit: int) -> bool:
    try:
        return ds.count() <= limit
    except Exception:
        return False


def _lookup_nodes(ds, nodes_ds, mode: str, num_partitions: int, broadcast_limit: int):
    """Attach lon/lat to rows keyed by ``node_id`` (left semantics)."""
    if mode == "auto":
        mode = "broadcast" if _estimate_small(nodes_ds, broadcast_limit) else "shuffle"
    if mode == "broadcast":
        idx_ref = build_node_index(nodes_ds)

        def lookup(batch: pa.Table) -> pa.Table:
            idx: BroadcastIndex = ray.get(idx_ref)
            raw = _np(batch.column("node_id"))
            if raw.dtype.kind == "f":  # null node_ids (missing ways) → no match
                raw = np.where(np.isnan(raw), -(2**62), raw)
            keys = np.asarray(raw, dtype=np.int64)
            found, (lon, lat) = idx.lookup(keys)
            lon = np.where(found, lon, np.nan)
            lat = np.where(found, lat, np.nan)
            out = batch.append_column("lon", pa.array(lon, pa.float32()))
            return out.append_column("lat", pa.array(lat, pa.float32()))

        return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)
    tune_shuffle_context()
    nodes_side = nodes_ds.select_columns(["id", "lon", "lat"]).rename_columns({"id": "nid"})
    joined = ds.join(
        nodes_side,
        join_type="left_outer",
        num_partitions=effective_num_partitions(num_partitions),
        on=("node_id",),
        right_on=("nid",),
    )
    return joined.map_batches(_drop_if_present("nid"), batch_format="pyarrow", zero_copy_batch=True)


def _drop_if_present(*cols):
    def fn(batch: pa.Table) -> pa.Table:
        present = [c for c in cols if c in batch.column_names]
        return batch.drop_columns(present) if present else batch

    return fn


# --------------------------------------------------------------------------
# vectorized bucket regroup
# --------------------------------------------------------------------------


def add_bucket(batch: pa.Table, key: str, num_buckets: int, out: str = "bucket") -> pa.Table:
    keys = np.asarray(_np(batch.column(key)), dtype=np.int64)
    b = (splitmix64(keys.view(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
    return batch.append_column(out, pa.array(b, pa.int32()))


_LIST_TYPES = {
    "node_id": pa.int64(),
    "way_id": pa.int64(),
    "lon": pa.float32(),
    "lat": pa.float32(),
    "okey": pa.int64(),
    "inner": pa.bool_(),
}

_META_TYPES = {
    "ftype": pa.uint64(),
    "labels": pa.binary(),
    "is_area": pa.bool_(),
    "doc_id": pa.string(),
    "span_idx": pa.int32(),
}


def regroup_bucket(
    df: pd.DataFrame, key: str, sort_col: str, list_cols: list[str], meta_cols: list[str]
) -> pa.Table:
    """One bucket → per-key table: list columns in sort order + meta
    scalars taken from the first (lowest sort key) row of each group.

    Fully vectorized: one lexsort + one np.unique per bucket.
    """
    empty_schema = pa.schema(
        [pa.field(key, pa.int64())]
        + [pa.field(f"{c}_list", pa.list_(_LIST_TYPES[c])) for c in list_cols]
        + [pa.field(c, _META_TYPES[c]) for c in meta_cols]
    )
    n = len(df)
    if n == 0:
        return empty_schema.empty_table()
    keys = df[key].to_numpy()
    sortv = df[sort_col].to_numpy()
    order = np.lexsort((sortv, keys))
    k_sorted = keys[order]
    uniq, starts = np.unique(k_sorted, return_index=True)
    offsets = np.concatenate([starts, [n]]).astype(np.int64)
    data: dict[str, pa.Array] = {key: pa.array(uniq, pa.int64())}
    for c in list_cols:
        flat = df[c].to_numpy()[order]
        data[f"{c}_list"] = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, _LIST_TYPES[c], from_pandas=True)
        )
    first = order[starts]
    for c in meta_cols:
        vals = df[c].to_numpy()[first]
        data[c] = pa.array(vals, _META_TYPES[c], from_pandas=True)
    return pa.Table.from_pydict(data, schema=empty_schema)


# --------------------------------------------------------------------------
# way → node dependency resolution (single shuffle, meta rides pos==0)
# --------------------------------------------------------------------------


def explode_ways_with_meta(batch: pa.Table) -> pa.Table:
    """prepared-ways batch → one row per ref.

    Input columns: id, refs, is_area, ftype, labels, doc_id, span_idx.
    Output: node_id, way_id, pos + meta columns (null except pos==0).
    The J1 inverted index (/root/reference/src/denorm.rs:366-378) as a
    pure Arrow explode.
    """
    offsets, flat = _list_offsets(batch.column("refs"))
    counts = np.diff(offsets)
    way_ids = np.repeat(_np(batch.column("id")), counts)
    pos = np.arange(offsets[-1], dtype=np.int32) - np.repeat(offsets[:-1], counts).astype(np.int32)
    first = pos == 0
    first_parent = np.repeat(np.arange(len(batch)), counts)

    # null-masked take: rows with pos>0 get a NULL index, so the meta
    # value ships once per way and the rest is null bitmap — no Python
    # object materialization (the old to_pylist round-trip was the one
    # per-row Python cost left in the shuffle exchange path)
    take_idx = pa.array(
        np.where(first, first_parent, 0).astype(np.int64), mask=~first
    )

    def meta(col, typ):
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.take(take_idx).cast(typ)

    return pa.table(
        {
            "node_id": flat,
            "way_id": pa.array(way_ids, pa.int64()),
            "pos": pa.array(pos, pa.int32()),
            "is_area": meta("is_area", pa.bool_()),
            "ftype": meta("ftype", pa.uint64()),
            "labels": meta("labels", pa.binary()),
            "doc_id": meta("doc_id", pa.string()),
            "span_idx": meta("span_idx", pa.int32()),
        }
    )


def resolve_ways_batch(batch: pa.Table, idx) -> pa.Table:
    """In-batch way resolution against a node index (Broadcast or
    Sharded — same ``lookup`` contract): flatten the refs list, one
    vectorized lookup, rebuild the lists with the SAME offsets."""
    refs = batch.column("refs")
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    off_np, flat_arr = _list_offsets(refs)
    flat = np.asarray(flat_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    found, (lon, lat) = idx.lookup(flat)
    lon = np.where(found, lon, np.nan)
    lat = np.where(found, lat, np.nan)
    off_arr = pa.array(off_np, pa.int32())
    return pa.table(
        {
            "way_id": batch.column("id"),
            "node_id_list": refs,
            "lon_list": pa.ListArray.from_arrays(off_arr, pa.array(lon, pa.float32())),
            "lat_list": pa.ListArray.from_arrays(off_arr, pa.array(lat, pa.float32())),
            "is_area": batch.column("is_area"),
            "ftype": batch.column("ftype"),
            "labels": batch.column("labels"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
        }
    )


def _resolve_ways_broadcast(prepared_ways, node_idx_ref):
    """Zero-shuffle way resolution: refs of a way are contiguous inside
    every prepared batch, so coord lookup happens in place — flatten the
    refs list, one vectorized searchsorted, rebuild the lists with the
    SAME offsets. No explode→shuffle→regroup roundtrip (the sort-based
    regroup dominated small-cluster wall time)."""

    def fn(batch: pa.Table) -> pa.Table:
        return resolve_ways_batch(batch, ray.get(node_idx_ref))

    return prepared_ways.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def resolve_ways(
    prepared_ways,
    nodes_ds,
    mode: str = "auto",
    num_partitions: int = 32,
    num_buckets: int | None = None,
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
    node_idx_ref=None,
):
    """prepared ways ⋈ nodes → per-way rows ready for encoding.

    Output columns: way_id (key), node_id_list (== refs, in order),
    lon_list, lat_list (NaN = unresolved), is_area, ftype, labels,
    doc_id, span_idx. Dataset analog of denormalize_ways
    (/root/reference/src/denorm.rs:380-393) + per-way projection
    (src/lib.rs:222-227).

    ``broadcast`` mode is shuffle-free (in-batch lookup); ``shuffle``
    is the planet-scale path: distributed hash join + bucket regroup.
    """
    if mode == "auto":
        mode = "broadcast" if _estimate_small(nodes_ds, broadcast_limit) else "shuffle"
    if mode == "broadcast":
        return _resolve_ways_broadcast(
            prepared_ways, node_idx_ref or build_node_index(nodes_ds)
        )
    num_buckets = num_buckets or num_partitions
    exploded = prepared_ways.map_batches(
        explode_ways_with_meta, batch_format="pyarrow", zero_copy_batch=True
    )
    looked = _lookup_nodes(exploded, nodes_ds, mode, num_partitions, broadcast_limit)
    bucketed = looked.map_batches(
        lambda b: add_bucket(b, "way_id", num_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed.groupby("bucket").map_groups(
        lambda df: regroup_bucket(
            df,
            "way_id",
            "pos",
            ["node_id", "lon", "lat"],
            ["is_area", "ftype", "labels", "doc_id", "span_idx"],
        ),
        batch_format="pandas",
    )


def resolve_ways_and_relations(
    prepared_ways,
    prepared_relations,
    ways_ds,
    nodes_ds,
    num_partitions: int = 32,
    num_buckets: int | None = None,
    member_filter_limit: int = 16_000_000,
):
    """Shuffle-mode resolution of BOTH branches with ONE node exchange.

    The way branch and the relation second hop each hash-join against
    the full node table — the two largest exchanges of the planet-scale
    path (measured 15s + 15s of the 75s pipeline at 30M elements / 32
    CPUs). This fused plan:

    1. pushes the member-way filter down: the bare way table is
       restricted to ids actually referenced by prepared relations
       (the J6 way-offset pushdown, /root/reference/src/denorm.rs:409-421)
       BEFORE the ref explode — hop 1's probe side shrinks by
       ways : member-ways (54M → ~10M rows here). The member id set is
       broadcast as a sorted array while it is provably small
       (≤ ``member_filter_limit``); beyond that the filter is skipped
       (correct either way).
    2. unions the way-branch exploded refs with the relation hop-1
       output (schema-aligned, ``src``-tagged) and resolves
       coordinates in a SINGLE hash join against the node table
       (J2/J8 — one node exchange instead of two);
    3. splits by tag (cheap block filters over the materialized join
       output) and regroups each side exactly as the standalone paths
       do — downstream encoders see identical schemas (differential-
       tested against the unfused plan).

    Returns (resolved_ways_ds, resolved_relations_ds).
    """
    import pyarrow.compute as pc

    num_buckets = num_buckets or num_partitions
    tune_shuffle_context()
    npart = effective_num_partitions(num_partitions)

    members = prepared_relations.map_batches(
        explode_members_with_meta, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # member-way pushdown (J6): collect the distinct member way ids
    member_ids: set[int] = set()
    small = True
    for t in members.select_columns(["way_id"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        member_ids.update(t.column("way_id").to_numpy(zero_copy_only=False).tolist())
        if len(member_ids) > member_filter_limit:
            small = False
            break
    way_src = ways_ds.select_columns(["id", "refs"])
    if small:
        arr = np.fromiter(member_ids, dtype=np.int64, count=len(member_ids))
        arr.sort()
        filt_ref = ray.put(arr)

        def keep_member_ways(batch: pa.Table) -> pa.Table:
            cand = ray.get(filt_ref)
            ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(cand, ids)
            pos_c = np.clip(pos, 0, max(len(cand) - 1, 0))
            keep = (pos < len(cand)) & (cand[pos_c] == ids) if len(cand) else np.zeros(len(ids), bool)
            return batch.take(pa.array(np.flatnonzero(keep), pa.int64()))

        way_src = way_src.map_batches(
            keep_member_ways, batch_format="pyarrow", zero_copy_batch=True
        )
    way_refs = way_src.map_batches(
        explode_bare_way_refs, batch_format="pyarrow", zero_copy_batch=True
    )
    hop1 = members.join(
        way_refs,
        join_type="left_outer",
        num_partitions=npart,
        on=("way_id",),
        right_on=("wid",),
    )

    def align_rel(batch: pa.Table) -> pa.Table:
        n = len(batch)
        pos = _np(batch.column("pos"))
        if pos.dtype.kind == "f":
            pos = np.where(np.isnan(pos), 0, pos)
        pos64 = pos.astype(np.int64)
        mpos = _np(batch.column("mpos")).astype(np.int64)
        okey = (mpos << 32) | pos64
        return pa.table(
            {
                "node_id": batch.column("node_id"),
                "way_id": batch.column("way_id"),
                "src": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "pos": pa.nulls(n, pa.int32()),
                "is_area": pa.nulls(n, pa.bool_()),
                "rel_id": batch.column("rel_id"),
                "okey": pa.array(okey, pa.int64()),
                "inner": batch.column("inner"),
                "ftype": batch.column("ftype"),
                "labels": batch.column("labels"),
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
            }
        )

    def align_way(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node_id": batch.column("node_id"),
                "way_id": batch.column("way_id"),
                "src": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                "pos": batch.column("pos"),
                "is_area": batch.column("is_area"),
                "rel_id": pa.nulls(n, pa.int64()),
                "okey": pa.nulls(n, pa.int64()),
                "inner": pa.nulls(n, pa.bool_()),
                "ftype": batch.column("ftype"),
                "labels": batch.column("labels"),
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
            }
        )

    exploded_w = prepared_ways.map_batches(
        explode_ways_with_meta, batch_format="pyarrow", zero_copy_batch=True
    )
    unioned = exploded_w.map_batches(
        align_way, batch_format="pyarrow", zero_copy_batch=True
    ).union(hop1.map_batches(align_rel, batch_format="pyarrow", zero_copy_batch=True))

    looked = _lookup_nodes(
        unioned, nodes_ds, "shuffle", num_partitions, 0
    ).materialize()

    def split(src_val: int, drop: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            out = batch.filter(pc.equal(batch.column("src"), src_val))
            return out.drop_columns([c for c in drop if c in out.column_names])

        return fn

    ways_side = looked.map_batches(
        split(0, ["src", "rel_id", "okey", "inner"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rels_side = looked.map_batches(
        split(1, ["src", "pos", "is_area"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    ways_bucketed = ways_side.map_batches(
        lambda b: add_bucket(b, "way_id", num_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    resolved_ways = ways_bucketed.groupby("bucket").map_groups(
        lambda df: regroup_bucket(
            df,
            "way_id",
            "pos",
            ["node_id", "lon", "lat"],
            ["is_area", "ftype", "labels", "doc_id", "span_idx"],
        ),
        batch_format="pandas",
    )
    rels_bucketed = rels_side.map_batches(
        lambda b: add_bucket(b, "rel_id", num_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    resolved_rels = rels_bucketed.groupby("bucket").map_groups(
        lambda df: regroup_bucket(
            df,
            "rel_id",
            "okey",
            ["okey", "way_id", "node_id", "lon", "lat", "inner"],
            ["ftype", "labels", "doc_id", "span_idx"],
        ),
        batch_format="pandas",
    )
    return resolved_ways, resolved_rels


# --------------------------------------------------------------------------
# relation → way → node (two-hop, J5+J7)
# --------------------------------------------------------------------------


def explode_members_with_meta(batch: pa.Table) -> pa.Table:
    """prepared-relations batch → one row per (already filtered) member.

    Input: id, members (Way/inner|outer only), ftype, labels, doc_id,
    span_idx. Output: way_id, rel_id, mpos, inner + meta on mpos==0.
    """
    offsets, flat = _list_offsets(batch.column("members"))
    counts = np.diff(offsets)
    rel_ids = np.repeat(_np(batch.column("id")), counts)
    mpos = np.arange(offsets[-1], dtype=np.int32) - np.repeat(offsets[:-1], counts).astype(np.int32)
    first = mpos == 0
    first_parent = np.repeat(np.arange(len(batch)), counts)

    # null-masked take (see explode_ways_with_meta): meta ships once per
    # relation, no Python object round-trip
    take_idx = pa.array(
        np.where(first, first_parent, 0).astype(np.int64), mask=~first
    )

    def meta(col, typ):
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.take(take_idx).cast(typ)

    roles = np.asarray(flat.field("role").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "way_id": flat.field("ref"),
            "rel_id": pa.array(rel_ids, pa.int64()),
            "mpos": pa.array(mpos, pa.int32()),
            "inner": pa.array(roles == "inner"),
            "ftype": meta("ftype", pa.uint64()),
            "labels": meta("labels", pa.binary()),
            "doc_id": meta("doc_id", pa.string()),
            "span_idx": meta("span_idx", pa.int32()),
        }
    )


def explode_bare_way_refs(batch: pa.Table) -> pa.Table:
    """full ways table → (wid, pos, node_id) rows (scalar columns only)."""
    offsets, flat = _list_offsets(batch.column("refs"))
    counts = np.diff(offsets)
    way_ids = np.repeat(_np(batch.column("id")), counts)
    pos = np.arange(offsets[-1], dtype=np.int32) - np.repeat(offsets[:-1], counts).astype(np.int32)
    return pa.table(
        {
            "wid": pa.array(way_ids, pa.int64()),
            "pos": pa.array(pos, pa.int32()),
            "node_id": flat,
        }
    )


def _resolve_relations_broadcast(prepared_relations, way_idx_ref, node_idx_ref):
    """Zero-shuffle two-hop resolution: member rows of a relation are
    contiguous in every prepared batch; member→refs expansion and
    ref→coord lookup are vectorized gathers against the two broadcast
    indexes, and per-relation lists rebuild from computed offsets —
    already in (member pos, ref pos) order, so no sort either."""

    def fn(batch: pa.Table) -> pa.Table:
        return resolve_relations_batch(batch, ray.get(way_idx_ref), ray.get(node_idx_ref))

    return prepared_relations.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_REL_MISSING = np.int64(-(2**62))


def resolve_relations_batch(batch: pa.Table, widx, nidx) -> pa.Table:
    """In-batch two-hop relation resolution (see
    ``_resolve_relations_broadcast``)."""
    MISSING = _REL_MISSING
    if len(batch) == 0:
        return _REL_RESOLVED_SCHEMA.empty_table()
    members = batch.column("members")
    if isinstance(members, pa.ChunkedArray):
        members = members.combine_chunks()
    m_off_raw, m_flat = _list_offsets(members)
    m_off = m_off_raw.astype(np.int64)
    m_way = np.asarray(m_flat.field("ref").to_numpy(zero_copy_only=False), dtype=np.int64)
    roles = np.asarray(m_flat.field("role").to_numpy(zero_copy_only=False))
    m_inner = roles == "inner"
    m_counts = np.diff(m_off)
    m_parent = np.repeat(np.arange(len(batch)), m_counts)
    m_pos = np.arange(m_off[-1], dtype=np.int64) - np.repeat(m_off[:-1], m_counts)

    found_w, counts, gathered = widx.lookup_refs(m_way)
    counts_eff = np.where(found_w, counts, 1).astype(np.int64)  # missing way → 1 null row
    total = int(counts_eff.sum())
    first_of = np.repeat(np.cumsum(counts_eff) - counts_eff, counts_eff)
    within = np.arange(total, dtype=np.int64) - first_of
    found_w_r = np.repeat(found_w, counts_eff)
    node_id = np.full(total, MISSING, dtype=np.int64)
    node_id[found_w_r] = gathered
    rel_row = np.repeat(m_parent, counts_eff)
    okey = (np.repeat(m_pos, counts_eff) << np.int64(32)) | within
    way_id_r = np.repeat(m_way, counts_eff)
    inner_r = np.repeat(m_inner, counts_eff)

    found_n, (lon, lat) = nidx.lookup(node_id)
    ok_n = found_n & (node_id != MISSING)
    lon = np.where(ok_n, lon, np.nan)
    lat = np.where(ok_n, lat, np.nan)

    rel_counts = np.bincount(rel_row, minlength=len(batch)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(rel_counts)])
    off_arr = pa.array(offs, pa.int32())
    null_mask = node_id == MISSING
    return pa.table(
        {
            "rel_id": batch.column("id"),
            "okey_list": pa.ListArray.from_arrays(off_arr, pa.array(okey, pa.int64())),
            "way_id_list": pa.ListArray.from_arrays(off_arr, pa.array(way_id_r, pa.int64())),
            "node_id_list": pa.ListArray.from_arrays(
                off_arr, pa.array(node_id, pa.int64(), mask=null_mask)
            ),
            "lon_list": pa.ListArray.from_arrays(off_arr, pa.array(lon, pa.float32())),
            "lat_list": pa.ListArray.from_arrays(off_arr, pa.array(lat, pa.float32())),
            "inner_list": pa.ListArray.from_arrays(off_arr, pa.array(inner_r, pa.bool_())),
            "ftype": batch.column("ftype"),
            "labels": batch.column("labels"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
        }
    )


_REL_RESOLVED_SCHEMA = pa.schema(
    [
        pa.field("rel_id", pa.int64()),
        pa.field("okey_list", pa.list_(pa.int64())),
        pa.field("way_id_list", pa.list_(pa.int64())),
        pa.field("node_id_list", pa.list_(pa.int64())),
        pa.field("lon_list", pa.list_(pa.float32())),
        pa.field("lat_list", pa.list_(pa.float32())),
        pa.field("inner_list", pa.list_(pa.bool_())),
        pa.field("ftype", pa.uint64()),
        pa.field("labels", pa.binary()),
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)


def resolve_relations(
    prepared_relations,
    ways_ds,
    nodes_ds,
    mode: str = "auto",
    num_partitions: int = 32,
    num_buckets: int | None = None,
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
    node_idx_ref=None,
    way_idx_ref=None,
):
    """Two-hop resolution → per-relation rows ready for encoding.

    Output: rel_id, okey_list ((mpos<<32)|pos order), way_id_list,
    node_id_list, lon_list, lat_list, inner_list + relation meta.
    Dataset analog of denormalize_relations
    (/root/reference/src/denorm.rs:409-436). Member order and ref
    order survive both shuffles via okey. ``broadcast`` mode is fully
    in-batch (both hops against broadcast indexes, zero shuffles).
    """
    if mode == "auto":
        mode = "broadcast" if _estimate_small(nodes_ds, broadcast_limit) else "shuffle"
    if mode == "broadcast":
        return _resolve_relations_broadcast(
            prepared_relations,
            way_idx_ref or build_way_refs_index(ways_ds),
            node_idx_ref or build_node_index(nodes_ds),
        )
    num_buckets = num_buckets or num_partitions
    members = prepared_relations.map_batches(
        explode_members_with_meta, batch_format="pyarrow", zero_copy_batch=True
    )
    way_refs = ways_ds.select_columns(["id", "refs"]).map_batches(
        explode_bare_way_refs, batch_format="pyarrow", zero_copy_batch=True
    )
    # hop 1: members ⋈ way refs (left: missing ways keep their member
    # row so relation meta survives; their node_id stays null)
    tune_shuffle_context()
    hop1 = members.join(
        way_refs,
        join_type="left_outer",
        num_partitions=effective_num_partitions(num_partitions),
        on=("way_id",),
        right_on=("wid",),
    )

    def fix_nulls(batch: pa.Table) -> pa.Table:
        pos = _np(batch.column("pos"))
        if pos.dtype.kind == "f":  # nulls from the left join → NaN
            pos = np.where(np.isnan(pos), 0, pos)
        pos = pos.astype(np.int64)
        mpos = _np(batch.column("mpos")).astype(np.int64)
        okey = (mpos << 32) | pos
        drop = [c for c in ("pos", "wid") if c in batch.column_names]
        out = batch.drop_columns(drop).append_column("okey", pa.array(okey, pa.int64()))
        return out

    hop1 = hop1.map_batches(fix_nulls, batch_format="pyarrow", zero_copy_batch=True)

    # hop 2: ⋈ nodes (unresolved refs keep NaN coords)
    looked = _lookup_nodes(hop1, nodes_ds, mode, num_partitions, broadcast_limit)

    bucketed = looked.map_batches(
        lambda b: add_bucket(b, "rel_id", num_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed.groupby("bucket").map_groups(
        lambda df: regroup_bucket(
            df,
            "rel_id",
            "okey",
            ["okey", "way_id", "node_id", "lon", "lat", "inner"],
            ["ftype", "labels", "doc_id", "span_idx"],
        ),
        batch_format="pandas",
    )
