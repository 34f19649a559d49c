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


def ingest_features(documents_ds, config: EngineConfig | None = None):
    """documents Dataset → features Dataset (lazy).

    Branches:
      nodes     → classify → encode points
      ways      → prepare (classify/filter/is_area) → explode refs
                  ⋈ nodes → bucket regroup → encode
      relations → prepare → members ⋈ way-refs ⋈ nodes → regroup → encode
    """
    cfg = config or EngineConfig()
    branches = []

    need_ways = cfg.ingest_way or cfg.ingest_relation
    nodes_ds = elements_dataset(documents_ds, "node")
    ways_ds = elements_dataset(documents_ds, "way") if need_ways else None

    # The node table is consumed by up to three branches (its own
    # encode + both joins); parse it once. Same for ways when the
    # relation branch needs them. Materialized element tables also make
    # the auto-mode row count a metadata lookup instead of a re-parse.
    if cfg.materialize_elements and need_ways:
        nodes_ds = nodes_ds.materialize()
        if cfg.ingest_relation and ways_ds is not None:
            ways_ds = ways_ds.materialize()

    mode = cfg.join_mode
    if mode == "auto":
        mode = (
            "broadcast"
            if need_ways and joins._estimate_small(nodes_ds, cfg.broadcast_limit)
            else ("broadcast" if not need_ways else "shuffle")
        )

    # broadcast indexes are built ONCE and shared by both joins
    node_idx_ref = way_idx_ref = None
    if mode == "broadcast" and need_ways:
        node_idx_ref = joins.build_node_index(nodes_ds)
        if cfg.ingest_relation:
            way_idx_ref = joins.build_way_refs_index(ways_ds)

    if cfg.ingest_node:
        branches.append(
            nodes_ds.map_batches(F.encode_nodes_batch, batch_format="pyarrow", zero_copy_batch=True)
        )

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
        rels_ds = elements_dataset(documents_ds, "relation")
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
                batch_size=cfg.encode_batch_size,
            )
        )

    if not branches:
        raise ValueError("all element kinds disabled")
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
