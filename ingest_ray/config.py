"""Engine configuration — the analog of the reference's IngestOptions
(/root/reference/src/lib.rs:34-56) plus the eyros tunables surface
(/root/reference/src/bin.rs:240-285), re-expressed as Ray Data knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # join layer
    join_mode: str = "auto"  # auto | broadcast | shuffle
    num_partitions: int = 32  # hash-join / regroup partition count
    # max build-side rows for broadcast-style joins. Below ~4M rows a
    # driver-built sorted-array index ships once via ray.put; above,
    # the zone-map sharded index (per-block min/max id over plasma
    # blocks, fetched lazily zero-copy — one physical copy per NODE)
    # takes over, measured 45% faster than the shuffle join at 30M
    # nodes. With f32 coords a shard row is 16B, so even this limit
    # is only ~4GB of plasma per node — comfortable on 128GiB-class
    # machines, and each node fetches only the shards its tasks
    # probe. Beyond it the distributed hash join ("shuffle") is the
    # planet-scale path.
    broadcast_limit: int = 250_000_000
    # element staging strategy:
    #   True    — parse once, materialize the full union element table;
    #             per-kind views and the sharded indexes are zero-copy
    #             slices of the same plasma blocks
    #   "index" — two-pass streaming: pass 1 materializes ONLY the
    #             join-relevant projection (id, ekind, lon, lat, refs —
    #             ~28 B/row vs ~59), pass 2 re-parses and streams
    #             straight into encode. Trades ~1 extra parse pass
    #             (CPU, scales with cores) for the full element table's
    #             plasma write+read (memory bandwidth, which doesn't) —
    #             the knob for the memory-bound high-CPU regime
    #   False   — per-kind streaming parses, nothing materialized
    materialize_elements: object = True
    # execute node/way/relation branches one at a time; with the
    # single-pass element parse the streaming union DAG no longer
    # thrashes, so the default is one streaming DAG (fewer barriers)
    eager_branches: bool = True
    # optional batch transform fused into every branch BEFORE its
    # materialize (e.g. cells.add_cell_columns) — avoids a separate
    # full pass + materialize over the features downstream
    post_map: object = None

    # batching (reference: CH_TAKE_LEN 10k / BATCH_SEND 10k / BATCH 100k)
    parse_batch_size: int = 4096  # documents per parse batch
    encode_batch_size: int = 8192  # joined way rows per encode batch
    # relations are ~2.5ms each to encode (ring stitching); a small
    # batch keeps task granularity fine enough to use every core
    relation_encode_batch_size: int = 1024

    # element-kind toggles (IngestOptions.ingest_node/way/relation)
    ingest_node: bool = True
    ingest_way: bool = True
    ingest_relation: bool = True

    # tiling (reference: 50k leaf, depth 30 — src/lib.rs:526, divide.rs:10)
    tile_leaf_capacity: int = 50_000
    tile_depth_limit: int = 30
    grid_divs: tuple[int, int] = (8, 8)

    # skew: tiles whose feature count exceeds leaf_capacity × salt_factor
    # get salted sub-keys during the shuffle (BASELINE.json north_rule)
    salt_factor: int = 4
    num_salts: int = 16

    # output
    output_path: str = "/tmp/ingest_ray_out"
    cells_resolutions: tuple[int, ...] = (7, 8, 9, 10, 11, 12)

    extra: dict = field(default_factory=dict)
