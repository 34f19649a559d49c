"""The ingest DAG — documents → features Dataset.

Ray-Data-first equivalent of the reference's three concurrent element
pipelines feeding one sink (/root/reference/src/lib.rs:84-406): three
lazy Dataset branches (nodes / ways / relations) that union into one
features stream. The streaming executor provides the backpressure the
reference built from bounded channels (src/lib.rs:92, denorm.rs:36);
the 10M/1M way/relation batch loops (src/lib.rs:48-49) are obsolete as
control flow — hash-partitioned joins bound memory instead
(SURVEY.md §2.3 J9/J10).
"""

from __future__ import annotations

from . import features as F
from . import joins
from .config import EngineConfig
from .elements import elements_dataset


def _relation_blocks(n_rel: int, batch_size: int) -> int:
    """Block count for the relation-encode repartition.

    Balances two measured failure modes at 32 CPUs / 600k relations:
    per-task overhead with many tiny blocks (586×1k-row tasks: 21.8 s)
    vs straggler waves with few fat ones (37×16k: 27.7 s); ~4 blocks
    per CPU of ≥256 rows was the sweet spot (128×4.7k: 14.3 s)."""
    from .util import cluster_cpus

    cpus = max(1, cluster_cpus())
    want = -(-n_rel // batch_size)
    lo = min(2 * cpus, max(1, n_rel // 256))
    hi = max(4 * cpus, -(-n_rel // 16384))
    return max(1, min(max(want, lo), hi))


def _overlap_fits(all_el) -> bool:
    """Overlap the branch drains only when plasma has headroom.

    Two concurrent streaming executors hold the materialized element
    table PLUS both branches' in-flight and output blocks; when that
    approaches the object-store cap the store churns evictions and the
    'optimization' inverts (measured at 120M elements / 40GB store:
    sequential 150 s vs overlapped 286 s, and 221 vs 269 in a paired
    A/B — the same overlap that wins 37.2 -> 33.2 s at 30M). 6x the
    element table is the proxy for peak concurrent footprint: both
    branches' in-flight + output blocks and the plasma watermarks bite
    well before literal capacity (3x still chose overlap at 120M/40GB
    and lost every paired measurement)."""
    import os as _os

    import ray as _ray

    forced = _os.environ.get("GRAFT_BRANCH_OVERLAP", "auto")
    if forced in ("0", "1"):  # explicit A/B override for measurement
        return forced == "1"
    try:
        cap = _ray.cluster_resources().get("object_store_memory", 0)
        return bool(cap) and all_el.size_bytes() * 6 < cap
    except Exception:
        return False


def _ingest_features_index_mode(documents_ds, cfg: EngineConfig):
    """Two-pass streaming ingest (``materialize_elements="index"``).

    Pass 1 (streaming): parse → project to the join-relevant columns
    (id, ekind, lon, lat, refs ≈ 28 B/row vs ~59 for the full union
    table) → materialize ONLY that projection; the sharded zone-map
    indexes are built over its blocks. Pass 2 (streaming): re-parse and
    flow node/way batches STRAIGHT into the fused encode — the full
    element table (tags, members, provenance) never enters the object
    store. The trade: ~1 extra parse pass, which is vectorized CPU that
    scales with cores, in exchange for the full table's plasma
    write+read, which is memory bandwidth that doesn't — the preferred
    shape for the memory-bound high-CPU regime (and for real clusters,
    where the re-parse also lands on fresh per-node DRAM controllers).
    Output equals the materialized path feature-for-feature (pinned by
    tests)."""
    import ray as _ray

    from .elements import elements_all_dataset, elements_index_dataset

    # pass 1: the LEAN parser — ids/coords/refs only, no tag or member
    # parsing, no provenance (the only per-row Python of the full parse
    # is the tag splitter, and pass 1 never needs it)
    idx_tbl = elements_index_dataset(documents_ds).materialize()
    node_idx_ref, way_idx_ref, kind_counts = joins.build_sharded_indexes_from_all(
        idx_tbl, cfg.ingest_relation, return_counts=True
    )

    branches = []
    kinds = tuple(
        k for k, on in (("node", cfg.ingest_node), ("way", cfg.ingest_way)) if on
    )
    if kinds:
        # pass 2: parse ONLY the enabled kinds (relation spans skip
        # their member/tag parse entirely) and stream straight into the
        # fused encode — no keep_kinds filter stage needed
        branches.append(
            elements_all_dataset(documents_ds, kinds=kinds).map_batches(
                lambda b: F.encode_all_batch(b, node_idx_ref, way_idx_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    if cfg.ingest_relation and kind_counts[2]:

        def encode_rel(b):
            return F.encode_relations_batch(
                joins.resolve_relations_batch(
                    b, _ray.get(way_idx_ref), _ray.get(node_idx_ref)
                )
            )

        n_blocks = _relation_blocks(kind_counts[2], cfg.relation_encode_batch_size)
        branches.append(
            elements_dataset(documents_ds, "relation")
            .map_batches(
                F.prepare_relations_batch, batch_format="pyarrow", zero_copy_batch=True
            )
            .repartition(n_blocks)
            .map_batches(encode_rel, batch_format="pyarrow", zero_copy_batch=True)
        )
    if not branches:
        raise ValueError("all element kinds disabled")
    if cfg.post_map is not None:
        branches = [
            b.map_batches(cfg.post_map, batch_format="pyarrow", zero_copy_batch=True)
            for b in branches
        ]
    if cfg.eager_branches:
        if len(branches) > 1 and _overlap_fits(idx_tbl):
            # overlap the drains: plasma holds only the pruned index in
            # this mode, so the headroom gate (6x the index table) is
            # far looser than the materialized path's — the relation
            # branch's scheduling slack absorbs into the node/way drain
            # (same rationale as the fused broadcast path; no Dataset
            # .join in either branch, so no aggregator deadlock)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(len(branches)) as ex:
                branches = list(ex.map(lambda b: b.materialize(), branches))
        else:
            branches = [b.materialize() for b in branches]
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def ingest_features(documents_ds, config: EngineConfig | None = None, all_el=None):
    """documents Dataset → features Dataset (lazy).

    Branches:
      nodes     → classify → encode points
      ways      → prepare (classify/filter/is_area) → explode refs
                  ⋈ nodes → bucket regroup → encode
      relations → prepare → members ⋈ way-refs ⋈ nodes → regroup → encode

    ``all_el`` (a pre-parsed union element Dataset, e.g. the committed
    elements stage of ``checkpoint.staged_ingest``) skips the parse.
    """
    cfg = config or EngineConfig()
    branches = []

    need_ways = cfg.ingest_way or cfg.ingest_relation
    if (
        all_el is None
        and cfg.materialize_elements == "index"
        and need_ways
        and cfg.join_mode in ("auto", "broadcast")
    ):
        # index mode IS a broadcast-index plan; an explicit shuffle
        # join_mode keeps the exchange plan and ignores the knob
        return _ingest_features_index_mode(documents_ds, cfg)
    if all_el is not None or (cfg.materialize_elements and need_ways):
        # parse ONCE: a single read+explode+parse pass over the corpus
        # materializes the union element table; per-kind "tables" are
        # cheap filtered projections of the plasma-resident blocks
        from .elements import elements_all_dataset, kind_view

        if all_el is None:
            all_el = elements_all_dataset(documents_ds)
        all_el = all_el.materialize()
        nodes_ds = kind_view(all_el, "node")
        ways_ds = kind_view(all_el, "way")
        rels_ds = kind_view(all_el, "relation") if cfg.ingest_relation else None
        total_elements = all_el.count()
    else:
        all_el = None
        nodes_ds = elements_dataset(documents_ds, "node")
        ways_ds = elements_dataset(documents_ds, "way") if need_ways else None
        rels_ds = elements_dataset(documents_ds, "relation") if cfg.ingest_relation else None
        total_elements = None

    mode = cfg.join_mode
    if mode == "auto":
        if not need_ways:
            mode = "broadcast"
        elif total_elements is not None and total_elements <= cfg.broadcast_limit:
            mode = "broadcast"  # nodes ≤ total elements ≤ limit
        else:
            mode = (
                "broadcast"
                if joins._estimate_small(nodes_ds, cfg.broadcast_limit)
                else "shuffle"
            )

    # broadcast indexes are built ONCE and shared by both joins
    node_idx_ref = way_idx_ref = None
    n_rel_hint = None
    if mode == "broadcast" and need_ways:
        if (
            all_el is not None
            and total_elements is not None
            and total_elements > joins.SHARDED_INDEX_THRESHOLD
        ):
            # one min/max sweep over the materialized blocks replaces
            # two filtered-scan executions (fixed ~5s → ~1s); the same
            # sweep yields per-kind counts, so the relation branch can
            # be sized WITHOUT its own materialize+count barrier
            node_idx_ref, way_idx_ref, kind_counts = joins.build_sharded_indexes_from_all(
                all_el, cfg.ingest_relation, return_counts=True
            )
            n_rel_hint = kind_counts[2]
        else:
            node_idx_ref = joins.build_node_index_auto(nodes_ds)
            if cfg.ingest_relation:
                way_idx_ref = joins.build_way_refs_index_auto(ways_ds)

    if mode == "broadcast" and all_el is not None:
        # fused fast path: elements → ONE map_batches producing node and
        # way features (in-batch joins; zero shuffles). Relations run as
        # their own small branch over a row-repartitioned dataset:
        # relation rows cluster at the end of real corpora (OSM PBF file
        # order), so in the mixed table a handful of all-relation blocks
        # each cost ~25s of ring stitching while every other core idles —
        # row-uniform repartition of the relation-only table restores
        # balanced task granularity (task = block in Ray Data).
        import pyarrow as pa

        from .elements import kind_segment

        enabled = [
            code for code, on in ((0, cfg.ingest_node), (1, cfg.ingest_way)) if on
        ]
        branches = []
        if enabled:

            def keep_kinds(b):
                # zero-copy contiguous slices per kind (blocks are
                # kind-ordered by construction; see kind_segment) — the
                # old is_in filter copied ~98% of every block's bytes
                segs = [kind_segment(b, code) for code in enabled]
                segs = [s for s in segs if len(s)]
                if not segs:
                    return b.schema.empty_table()
                return pa.concat_tables(segs)

            branches.append(
                all_el.map_batches(keep_kinds, batch_format="pyarrow", zero_copy_batch=True)
                .map_batches(
                    lambda b: F.encode_all_batch(b, node_idx_ref, way_idx_ref),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        if cfg.ingest_relation:
            import ray as _ray

            def encode_rel(b):
                return F.encode_relations_batch(
                    joins.resolve_relations_batch(
                        b, _ray.get(way_idx_ref), _ray.get(node_idx_ref)
                    )
                )

            if n_rel_hint is not None:
                # count came free with the index sweep: prepare →
                # repartition → encode fuse into ONE lazy execution
                # (the old path's materialize+count barrier was a
                # full extra pass + ~1s ramp). n_rel_hint counts RAW
                # relations (prepare may drop some), so blocks are at
                # most relation_encode_batch_size rows — fine-grained
                # in the safe direction.
                if n_rel_hint:
                    n_blocks = _relation_blocks(
                        n_rel_hint, cfg.relation_encode_batch_size
                    )
                    branches.append(
                        rels_ds.map_batches(
                            F.prepare_relations_batch,
                            batch_format="pyarrow",
                            zero_copy_batch=True,
                        )
                        .repartition(n_blocks)
                        .map_batches(
                            encode_rel, batch_format="pyarrow", zero_copy_batch=True
                        )
                    )
            else:
                prepared_r = rels_ds.map_batches(
                    F.prepare_relations_batch, batch_format="pyarrow", zero_copy_batch=True
                ).materialize()
                n_rel = prepared_r.count()
                if n_rel:
                    n_blocks = _relation_blocks(n_rel, cfg.relation_encode_batch_size)
                    # right-size in BOTH directions: task == block in Ray
                    # Data, so hundreds of sub-batch-size relation blocks
                    # cost ~20ms of dispatch each (measured 6.3s → 1.2s for
                    # the whole branch at 60k relations / 256 parse blocks)
                    nb = prepared_r.num_blocks()
                    if nb < n_blocks or nb > 2 * n_blocks:
                        prepared_r = prepared_r.repartition(n_blocks)
                    branches.append(
                        prepared_r.map_batches(
                            encode_rel, batch_format="pyarrow", zero_copy_batch=True
                        )
                    )
        if not branches:
            raise ValueError("all element kinds disabled")
        if cfg.post_map is not None:
            branches = [
                b.map_batches(cfg.post_map, batch_format="pyarrow", zero_copy_batch=True)
                for b in branches
            ]
        if cfg.eager_branches:
            if len(branches) > 1 and _overlap_fits(all_el):
                # overlap the branch drains: the relation branch runs at
                # ~40% cluster utilization (coarse blocks + ring-stitch
                # skew), so running it CONCURRENTLY with the node/way
                # branch absorbs it into that branch's scheduling slack
                # (measured 9.1 s + 17.1 s sequential → ~19 s overlapped
                # at 30M/32 CPUs). Safe here because the broadcast fused
                # path contains no Dataset.join — concurrent joins would
                # deadlock on aggregator actor pools (round-1 measured
                # pitfall); the shuffle path below stays sequential.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(len(branches)) as ex:
                    branches = list(ex.map(lambda b: b.materialize(), branches))
            else:
                branches = [b.materialize() for b in branches]
        out = branches[0]
        for b in branches[1:]:
            out = out.union(b)
        return out

    if cfg.ingest_node:
        branches.append(
            nodes_ds.map_batches(F.encode_nodes_batch, batch_format="pyarrow", zero_copy_batch=True)
        )

    if cfg.ingest_way and cfg.ingest_relation and mode == "shuffle":
        # fused plan: ONE node-table exchange serves both the way branch
        # and the relation second hop (see joins.resolve_ways_and_relations)
        prepared = ways_ds.map_batches(
            F.prepare_ways_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        prepared_r = rels_ds.map_batches(
            F.prepare_relations_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        resolved_w, resolved_r = joins.resolve_ways_and_relations(
            prepared,
            prepared_r,
            ways_ds,
            nodes_ds,
            num_partitions=cfg.num_partitions,
        )
        branches.append(
            resolved_w.map_batches(
                F.encode_ways_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=cfg.encode_batch_size,
            )
        )
        branches.append(
            resolved_r.map_batches(
                F.encode_relations_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=cfg.relation_encode_batch_size,
            )
        )
        if cfg.post_map is not None:
            branches = [
                b.map_batches(cfg.post_map, batch_format="pyarrow", zero_copy_batch=True)
                for b in branches
            ]
        if cfg.eager_branches:
            branches = [b.materialize() for b in branches]
        out = branches[0]
        for b in branches[1:]:
            out = out.union(b)
        return out

    if cfg.ingest_way:
        prepared = ways_ds.map_batches(
            F.prepare_ways_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        resolved = joins.resolve_ways(
            prepared,
            nodes_ds,
            mode=mode,
            num_partitions=cfg.num_partitions,
            broadcast_limit=cfg.broadcast_limit,
            node_idx_ref=node_idx_ref,
        )
        branches.append(
            resolved.map_batches(
                F.encode_ways_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=cfg.encode_batch_size,
            )
        )

    if cfg.ingest_relation:
        prepared_r = rels_ds.map_batches(
            F.prepare_relations_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        resolved_r = joins.resolve_relations(
            prepared_r,
            ways_ds,
            nodes_ds,
            mode=mode,
            num_partitions=cfg.num_partitions,
            broadcast_limit=cfg.broadcast_limit,
            node_idx_ref=node_idx_ref,
            way_idx_ref=way_idx_ref,
        )
        branches.append(
            resolved_r.map_batches(
                F.encode_relations_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=cfg.relation_encode_batch_size,
            )
        )

    if not branches:
        raise ValueError("all element kinds disabled")
    if cfg.post_map is not None:
        branches = [
            b.map_batches(cfg.post_map, batch_format="pyarrow", zero_copy_batch=True)
            for b in branches
        ]
    if cfg.eager_branches:
        # run the branches one at a time: the streaming executor juggling
        # all three complex branches of one union DAG measurably thrashes
        # (42s vs 23s at 8 CPUs on the 3M-element bench); features are
        # small relative to the corpus, so per-branch materialize is the
        # same cost class as the tile-stage materialize that follows
        branches = [b.materialize() for b in branches]
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out
