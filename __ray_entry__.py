"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere below (tests/bench own their
sessions elsewhere).

* ``entry()``      — flagship ingest on sf0.001 (documents-with-spans
  corpus synthesized deterministically + the driver's documents table
  carried through as text spans) → features Dataset.
* ``queries()``    — one entry per implemented operator
  (SURVEY.md §2 + the training-data ops); each takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every
  SQL-expressible query (column names match exactly). Geo-only /
  sketch-based ops are rows-only by design and have no entry here.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

_REPO = os.path.dirname(os.path.abspath(__file__))
import sys

if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SYNTH_ELEMENTS_PER_SF = 200_000  # sf0.01 → 2,000 elements


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.01


def _synth_docs_ds(sf_dir: str, with_testdata_text: bool = False):
    import ray.data as rd

    from ingest_ray.synth import synth_documents

    n = max(200, int(SYNTH_ELEMENTS_PER_SF * _sf_of(sf_dir)))
    tbl = synth_documents(n)
    if with_testdata_text:
        docs = pa.parquet.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        from ingest_ray.spans import DOCUMENTS_SCHEMA

        extra = pa.Table.from_pylist(
            [
                {
                    "doc_id": f"td-{d}",
                    "spans": [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
                }
                for d, t in zip(
                    docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
                )
            ],
            schema=DOCUMENTS_SCHEMA,
        )
        tbl = pa.concat_tables([tbl, extra])
    # one block per slice: rd.from_arrow(single_table) yields ONE block,
    # which caps every downstream stage (parse, explode, sort partitions,
    # map_groups fan-out) at 1-3 tasks regardless of cluster width —
    # measured as per_bucket running 3-wide on a 32-CPU box
    nb = min(64, max(1, len(tbl) // 300))  # ≥300 docs/block; 64 at sf≥0.1
    step = max(1, -(-len(tbl) // nb))
    parts = [tbl.slice(i, step) for i in range(0, max(len(tbl), 1), step)]
    return rd.from_arrow(parts)


def _synth_features(sf_dir: str, mode: str = "broadcast"):
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features

    return ingest_features(
        _synth_docs_ds(sf_dir), EngineConfig(join_mode=mode, num_partitions=8)
    )


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: sf0.001 corpus → features with cell indexes."""
    from ingest_ray.cells import add_cell_columns

    feats = _synth_features("/root/testdata/sf0.001", mode="broadcast")
    return feats.map_batches(add_cell_columns, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Ray-side query implementations
# --------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns=None):
    import pyarrow.parquet as pq
    import ray.data as rd

    # the driver-written testdata parquet carries pandas schema
    # metadata, which makes pa.Schema unhashable inside Ray's
    # schema-unification fast path (warn + slow path per op) — read
    # under the metadata-free schema instead
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def q_q1_lineitem(sf_dir: str):
    """TPC-H-Q1-ish grouped aggregate with per-batch pre-aggregation
    (combiner before the shuffle — SURVEY.md §4 skew row)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t = t.append_column("rev", rev)
        t = t.append_column("one", pa.array(np.ones(len(t), dtype=np.int64)))
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("rev", "sum"), ("one", "sum")]
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = part.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("rev_sum", alias_name="revenue"),
        Sum("one_sum", alias_name="n"),
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["n"] = df["n"].astype("int64")
    return df


def q_join_customer_orders(sf_dir: str):
    """Two-hop distributed hash join + grouped counts (J3/J7 analog on
    relational data)."""
    from ray.data.aggregate import Count, Sum

    from ingest_ray.util import effective_num_partitions, tune_shuffle_context

    tune_shuffle_context()
    np_eff = effective_num_partitions(8)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    # pre-aggregate the fact side BEFORE the join (combiner pushdown):
    # per-customer order counts shrink the join input ~10x and make the
    # final count-distinct a plain Count
    per_cust = orders.groupby("o_custkey").aggregate(Count(alias_name="cnt"))
    j = per_cust.join(cust, join_type="inner", num_partitions=np_eff, on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(nation, join_type="inner", num_partitions=np_eff, on=("c_nationkey",), right_on=("n_nationkey",))
    out = (
        j.groupby("n_name")
        .aggregate(Sum("cnt", alias_name="n_orders"), Count(alias_name="n_customers"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def q_filter_project(sf_dir: str):
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate"])

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1995-09-01"))),
            pc.less(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1995-10-01"))),
        )
        m = pc.and_(m, pc.greater(t.column("l_discount"), pa.scalar(0.05)))
        t = t.filter(m)
        return t.select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_window_events(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + distinct users
    (distinct via a second keyed aggregate — no driver loops)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        b = ts // (3600 * 1_000_000)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "bucket": pa.array(b, pa.int64()),
                "user_id": t.column("user_id"),
            }
        )

    base = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    n = base.groupby(["event_type", "bucket"]).aggregate(Count(alias_name="n")).to_pandas()
    uniq = base.groupby(["event_type", "bucket", "user_id"]).aggregate(Count(alias_name="x"))
    nu = uniq.groupby(["event_type", "bucket"]).aggregate(Count(alias_name="n_users")).to_pandas()
    out = n.merge(nu, on=["event_type", "bucket"])
    out["n"] = out["n"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_sessionize_events(sf_dir: str):
    """Stateful windowing: per-user session count with 30-min gaps —
    groupby(user).map_groups over ts-sorted groups (the guide's
    stream-shaped recipe)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = int(1 + (np.diff(us) > 1800 * 1_000_000).sum())
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]], "n_sessions": [n]})

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def q_dedup_exact(sf_dir: str):
    from ingest_ray.functions.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(docs).to_pandas()
    return out[["keep_id", "dup_count"]].astype({"keep_id": "int64", "dup_count": "int64"})


def q_token_count(sf_dir: str):
    from ingest_ray.functions.text import token_count_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pandas"
    )


def q_asof_events_orders(sf_dir: str):
    """Each event ⋈ the user's latest order at-or-before the event
    time (inner as-of). One hash exchange; per-bucket merge_asof.
    DuckDB-oracled against a native ASOF JOIN with the same
    deterministic tie-break."""
    from ingest_ray.functions.temporal import asof_join

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    return asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_key="o_custkey",
        right_cols=("o_orderkey", "o_totalprice"),
        tie_col="o_orderkey",
    )


def q_range_orders_lineitem(sf_dir: str):
    """Interval join: every (order, lineitem) pair of the same order
    key whose lineitem shipped within 60 days of the order date. One
    hash exchange, per-bucket vectorized window search
    (see temporal.range_join)."""
    from ingest_ray.functions.temporal import range_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_linenumber", "l_extendedprice"])
    days60_us = 60 * 86_400 * 1_000_000
    return range_join(
        orders,
        items,
        key="o_orderkey",
        left_ts="o_orderdate",
        right_ts="l_shipdate",
        lo_offset=0,
        hi_offset=days60_us,
        right_key="l_orderkey",
        right_cols=("l_linenumber", "l_extendedprice"),
    )


def q_sliding_window_events(sf_dir: str):
    """Per event: count + sum(value) over the same user's trailing
    hour (RANGE semantics — ties share the full aggregate). One hash
    exchange; per-bucket prefix sums + one searchsorted."""
    from ingest_ray.functions.temporal import sliding_window_agg

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return sliding_window_agg(
        events, key="user_id", ts="ts", value="value", window=3_600 * 1_000_000
    )


def q_topk_orders_per_cust(sf_dir: str):
    """Top-3 orders per customer by total price (grouped top-k with a
    combiner pre-prune; deterministic orderkey tie-break)."""
    from ingest_ray.functions.grouped import grouped_topk

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return grouped_topk(
        orders, key="o_custkey", val="o_totalprice", k=3, tie_col="o_orderkey"
    )


def q_token_pieces(sf_dir: str):
    from ingest_ray.functions.text import token_pieces_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_pieces_batch, batch_format="pandas"
    )


def q_quality(sf_dir: str):
    from ingest_ray.functions.text import quality_score_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pandas"
    )


def q_ngram_jaccard(sf_dir: str):
    from ingest_ray.functions.dedup import ngram_jaccard_pairs

    table = pa.parquet.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, table, threshold=0.8)
    return out.select_columns(["a", "b"])


def q_embedding_near_dup(sf_dir: str):
    from ingest_ray.functions.dedup import embedding_near_pairs

    table = pa.parquet.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_pairs(ds, table, threshold=0.4)


def q_embedding_near_dup_lsh(sf_dir: str):
    """Scale path of embedding_near_dup: random-hyperplane LSH buckets
    + exact in-bucket verification, no corpus broadcast. Band geometry
    tuned for the synthetic corpus's 0.4 threshold; subset-of-exact
    and recall are pinned by pytest."""
    from ingest_ray.functions.dedup import embedding_near_pairs_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_pairs_lsh(ds, threshold=0.4, bits_per_band=3, num_bands=12)


def q_ann_topk(sf_dir: str):
    from ingest_ray.functions.ann import brute_force_topk

    table = pa.parquet.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    queries = table.filter(pa.compute.less(table.column("vec_id"), 4))
    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_force_topk(corpus, queries, k=5)


def q_grid_cell_customers(sf_dir: str):
    """Grid-cell assignment arithmetic over key-derived points (exact
    integer math so the oracle matches bit-for-bit)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def cellify(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ix = (k * 9973 % 36000) // 4500
        iy = (k * 9949 % 18000) // 2250
        return pa.table({"cell": pa.array(iy * 8 + ix, pa.int64())})

    out = ds.map_batches(cellify, batch_format="pyarrow", zero_copy_batch=True)
    df = out.groupby("cell").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df


def q_hex_cell_customers(sf_dir: str):
    """Hex cell assignment (the engine's axial cube-rounding math) over
    key-derived points — DuckDB-oracled bit-for-bit: the SQL twin
    replicates qf/rf, cube rounding and the id packing in plain
    arithmetic (cells.hex_cell, res 7)."""
    from ray.data.aggregate import Count

    from ingest_ray.cells import hex_cell

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def cellify(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = (k * 9973 % 36000) / 100.0 - 180.0
        py = (k * 9949 % 18000) / 100.0 - 90.0
        cells = hex_cell(px, py, 7).view(np.int64)
        return pa.table({"cell": pa.array(cells, pa.int64())})

    out = ds.map_batches(cellify, batch_format="pyarrow", zero_copy_batch=True)
    df = out.groupby("cell").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df


def q_knn_customers(sf_dir: str):
    """Exact kNN geo join over key-derived customer points (queries =
    c_custkey ≤ 20, corpus = all customers, k=5, ties by neighbor id) —
    the DuckDB-oracled twin of the approximate k-ring join. Pattern:
    corpus STREAMS in batches against the broadcast query set; only
    per-batch local top-k partials reach the driver merge."""
    import ray

    ds = _read(sf_dir, "customer", ["c_custkey"])
    K = 5

    def pts(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return (k * 9973 % 36000) / 100.0 - 180.0, (k * 9949 % 18000) / 100.0 - 90.0

    qk = np.arange(1, 21, dtype=np.int64)
    qx, qy = pts(qk)
    qref = ray.put((qk, qx, qy))

    def local_topk(t: pa.Table) -> pa.Table:
        qk_, qx_, qy_ = ray.get(qref)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = pts(ck)
        out_q, out_n, out_d = [], [], []
        for i in range(len(qk_)):
            keep = ck != qk_[i]
            dx = cx[keep] - qx_[i]
            dy = cy[keep] - qy_[i]
            d2 = dx * dx + dy * dy
            ids = ck[keep]
            kk = min(K, len(ids))
            if kk == 0:
                continue
            # lexsort (d2, id): boundary ties keep the LOWEST neighbor
            # id, so per-batch top-k ⊇ the global (d2, id) top-k
            top = np.lexsort((ids, d2))[:kk]
            out_q.append(np.full(len(top), qk_[i]))
            out_n.append(ids[top])
            out_d.append(d2[top])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "d2": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = partials.to_pandas()
    rows = []
    for qid, g in df.groupby("qid"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), g["d2"].to_numpy()))[:K]
        for rank, j in enumerate(order, start=1):
            rows.append((int(qid), int(g["neighbor_id"].to_numpy()[j]), rank))
    out = pd.DataFrame(rows, columns=["qid", "neighbor_id", "rank"])
    out["rank"] = out["rank"].astype("int64")
    return out


def q_pip_customers(sf_dir: str):
    """Real ray-casting PIP kernel over key-derived points vs a
    rectangle polygon (oracle: BETWEEN)."""
    from ingest_ray.spatial import pip_join

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def pts(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = (k * 9973 % 36000) / 100.0 - 180.0
        py = (k * 9949 % 18000) / 100.0 - 90.0
        return pa.table(
            {
                "c_custkey": pa.array(k, pa.int64()),
                "lon": pa.array(px, pa.float64()),
                "lat": pa.array(py, pa.float64()),
            }
        )

    points = ds.map_batches(pts, batch_format="pyarrow", zero_copy_batch=True)
    rect = pa.Table.from_pylist(
        [
            {
                "key": 1,
                "positions": [-90.055, -45.055, 60.155, -45.055, 60.155, 30.255, -90.055, 30.255],
                "ring_offsets": [0, 4],
                "minx": -90.055,
                "miny": -45.055,
                "maxx": 60.155,
                "maxy": 30.255,
            }
        ]
    )
    out = pip_join(points, rect, keep_cols=("c_custkey",))
    return out.select_columns(["c_custkey"])


# ----- rows-only (geo / sketch) queries -----


def q_ingest_synth(sf_dir: str):
    feats = _synth_features(sf_dir, mode="shuffle")
    return feats.select_columns(["key", "ftype", "kind", "minx", "miny", "maxx", "maxy"])


def q_golden_features(sf_dir: str):
    import ray.data as rd

    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import golden_documents

    feats = ingest_features(
        rd.from_arrow(golden_documents()), EngineConfig(join_mode="broadcast", num_partitions=4)
    )
    return feats.select_columns(["key", "ftype", "kind", "minx", "miny", "maxx", "maxy"])


def q_tiles_synth(sf_dir: str):
    from ingest_ray.tiles import assign_tiles

    feats = _synth_features(sf_dir)
    return assign_tiles(feats, grid_divs=(8, 8), leaf_capacity=1000).select_columns(
        ["key", "tile_cell", "tile_path", "tile_depth"]
    )


def q_tiles_aggregated_synth(sf_dir: str):
    """Skew-proof aggregated quad divide — must equal q_tiles_synth's
    assignments exactly (also property-tested)."""
    from ingest_ray.tiles import assign_tiles_aggregated

    feats = _synth_features(sf_dir)
    return assign_tiles_aggregated(feats, grid_divs=(8, 8), leaf_capacity=1000).select_columns(
        ["key", "tile_cell", "tile_path", "tile_depth"]
    )


def q_tiles_store_aggregated(sf_dir: str):
    """Skew-defused store write: tile paths from the aggregated divide
    (no cell co-location), write shuffled by PHYSICAL TILE (thousands
    of capacity-bounded groups — the salted-key exchange the north
    rule demands, with the divide's own path bits as the salt), then
    distributed per-cell manifest assembly. The pytest twin pins the
    store to byte equality with the exact per-cell path."""
    import shutil
    import tempfile

    from ingest_ray.checkpoint import optimize_to_tiles, read_tiles

    feats = _synth_features(sf_dir)
    store = tempfile.mkdtemp(prefix="ingest_ray_aggr_store_")
    try:
        optimize_to_tiles(
            feats, store, grid_divs=(8, 8), leaf_capacity=1000, resume=False,
            divide="aggregated",
        ).materialize()
        rows = (
            read_tiles(store)
            .select_columns(["key", "tile_cell", "tile_path"])
            .to_pandas()
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return rows.sort_values(["key"]).reset_index(drop=True)


def q_zoom_pyramid_synth(sf_dir: str):
    """Base store → one zoom-4 pyramid level: sub-pixel features
    dropped, rings RDP-simplified and re-earcut, re-tiled into a
    committed per-zoom store. Returns per-feature vertex counts
    (rows-only; invariants pinned in pytest)."""
    import shutil
    import tempfile

    from ingest_ray.checkpoint import optimize_to_tiles, read_tiles
    from ingest_ray.pyramid import build_zoom_pyramid

    feats = _synth_features(sf_dir)
    store = tempfile.mkdtemp(prefix="ingest_ray_pyr_store_")
    try:
        optimize_to_tiles(
            feats, store, grid_divs=(8, 8), leaf_capacity=1000, resume=False
        ).materialize()
        build_zoom_pyramid(store, zooms=(4,), grid_divs=(8, 8), leaf_capacity=1000)[
            4
        ].materialize()
        import os as _os

        rows = (
            read_tiles(_os.path.join(store, "zoom", "z4"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "key": b.column("key"),
                        "kind": b.column("kind").cast(pa.int32()),
                        "n_pts": pa.compute.divide(
                            pa.compute.list_value_length(b.column("positions")).cast(
                                pa.int64()
                            ),
                            2,
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return rows.sort_values(["key"]).reset_index(drop=True)


def q_changeset_golden(sf_dir: str):
    """Incremental update rounds 0-3 (the reference's pinned o5c
    replication loop, tests/ingest.rs:90-400): create/modify/delete
    with one- and two-hop dependency propagation, chained through the
    updated element tables. Returns the final store — the pytest twin
    additionally asserts byte equality with a fresh ingest per round."""
    import ray.data as rd

    from ingest_ray.changeset import apply_changeset, merge_features
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import golden_documents
    from ingest_ray.changeset import GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3
    CHANGES0 = [
        {"op": "modify", "kind": "node", "element": {"id": 2000, "lon": 13.03, "lat": 37.04, "tags": [("highway", "bus_stop")]}},
        {"op": "modify", "kind": "node", "element": {"id": 9000, "lon": 4.999, "lat": -9.999, "tags": []}},
        {"op": "delete", "kind": "node", "element": {"id": 9003}},
        {"op": "create", "kind": "node", "element": {"id": 9007, "lon": 5.001, "lat": -10.001, "tags": []}},
        {"op": "delete", "kind": "way", "element": {"id": 555}},
        {"op": "modify", "kind": "way", "element": {"id": 600, "refs": [9000, 9001, 9002, 9007, 9000], "tags": []}},
    ]

    docs = rd.from_arrow(golden_documents())
    cfg = EngineConfig(join_mode="broadcast")
    out = pa.concat_tables(
        list(ingest_features(docs, cfg).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    )
    state = None
    for changes in (CHANGES0, GOLDEN_ROUND1, GOLDEN_ROUND2, GOLDEN_ROUND3):
        delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
        delta_t = (
            pa.concat_tables(
                list(delta.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
            )
            if delta is not None
            else out.schema.empty_table()
        )
        out = merge_features(out, delta_t, removed)
    return out.select(["key", "ftype", "kind", "minx", "miny", "maxx", "maxy"])


def q_changeset_o5c(sf_dir: str):
    """Same four update rounds as ``changeset_golden`` but driven from
    the reference's o5c BINARY fixtures via ``parse_o5c`` (LEB128 +
    delta streams + rolling string table) — pytest pins the parse and
    the final store to the XML-driven run."""
    import ray.data as rd

    from ingest_ray.changeset import apply_changeset, merge_features, parse_o5c
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import golden_documents

    docs = rd.from_arrow(golden_documents())
    cfg = EngineConfig(join_mode="broadcast")
    out = pa.concat_tables(
        list(ingest_features(docs, cfg).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    )
    state = None
    for i in range(4):
        with open(f"/root/reference/tests/data/0/changeset{i}.o5c", "rb") as f:
            changes = parse_o5c(f.read())
        delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
        delta_t = (
            pa.concat_tables(
                list(delta.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
            )
            if delta is not None
            else out.schema.empty_table()
        )
        out = merge_features(out, delta_t, removed)
    return out.select(["key", "ftype", "kind", "minx", "miny", "maxx", "maxy"])


def q_patch_tiles_store(sf_dir: str):
    """Incremental TILE-STORE patching: commit a store, push the four
    changeset rounds through ``checkpoint.patch_tiles`` (only affected
    grid cells rewrite, pruned via manifest key zone maps), and return
    the final tile assignments. The pytest twin asserts byte equality
    with a from-scratch optimize of the final corpus AND that
    untouched cells' files are never rewritten."""
    import shutil
    import tempfile

    import ray.data as rd

    from ingest_ray.changeset import apply_changeset, merge_features, parse_o5c
    from ingest_ray.checkpoint import optimize_to_tiles, patch_tiles, read_tiles
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import golden_documents

    docs = rd.from_arrow(golden_documents())
    cfg = EngineConfig(join_mode="broadcast")
    current = pa.concat_tables(
        list(ingest_features(docs, cfg).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    )
    store = tempfile.mkdtemp(prefix="ingest_ray_patch_store_")
    try:
        optimize_to_tiles(
            rd.from_arrow(current), store, grid_divs=(4, 4), leaf_capacity=2, resume=False
        ).materialize()
        state = None
        for i in range(4):
            with open(f"/root/reference/tests/data/0/changeset{i}.o5c", "rb") as f:
                changes = parse_o5c(f.read())
            delta, removed, state = apply_changeset(docs, changes, cfg, element_tables=state)
            delta_t = (
                pa.concat_tables(
                    list(delta.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
                )
                if delta is not None
                else current.schema.empty_table()
            )
            current = merge_features(current, delta_t, removed)
            patch_tiles(store, delta_t, removed, leaf_capacity=2)
        rows = read_tiles(store).select_columns(["key", "tile_cell", "tile_path"]).to_pandas()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return rows.sort_values(["key"]).reset_index(drop=True)


def q_cells_synth(sf_dir: str):
    from ingest_ray.cells import add_cell_columns

    feats = _synth_features(sf_dir)
    out = feats.map_batches(add_cell_columns, batch_format="pyarrow")
    return out.select_columns(["key", "hex_r7", "hex_r9", "hex_r12", "s2"])


def q_knn_geo_synth(sf_dir: str):
    import ray.data as rd

    from ingest_ray.elements import elements_dataset
    from ingest_ray.spatial import knn_join

    docs = _synth_docs_ds(sf_dir)
    nodes = elements_dataset(docs, "node").select_columns(["id", "lon", "lat"])
    corpus = pa.concat_tables(list(nodes.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    queries = rd.from_arrow(
        pa.table(
            {
                "qid": corpus.column("id").slice(0, 50),
                "lon": corpus.column("lon").slice(0, 50),
                "lat": corpus.column("lat").slice(0, 50),
            }
        ).rename_columns(["qid", "lon", "lat"])
    )
    return knn_join(queries, corpus, k=3, res=8, concurrency=2)


def q_pip_geo_synth(sf_dir: str):
    import ray.data as rd

    from ingest_ray.elements import elements_dataset
    from ingest_ray.spatial import pip_join

    docs = _synth_docs_ds(sf_dir)
    feats = _synth_features(sf_dir)
    areas = pa.concat_tables(
        list(
            feats.filter(expr="kind == 3")
            .select_columns(["key", "positions", "ring_offsets", "minx", "miny", "maxx", "maxy"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        )
    )
    nodes = elements_dataset(docs, "node").select_columns(["id", "lon", "lat"])
    pts = nodes.rename_columns({"id": "pid"})
    out = pip_join(pts, areas, keep_cols=("pid",))
    return out.select_columns(["pid", "poly_key"])


def q_raster_vector_synth(sf_dir: str):
    from ingest_ray.spatial import raster_vector_join, synth_raster_chips

    feats = _synth_features(sf_dir)
    chips = synth_raster_chips((138.0, 34.0, 141.0, 37.0), res=6)  # over the hotspot
    return raster_vector_join(feats, chips, res=6)


def q_pip_geo_part(sf_dir: str):
    """Cell-partitioned PIP join — both sides stay Datasets end to end
    (the planet-scale path; equals pip_geo_synth, property-tested)."""
    import ray.data as rd

    from ingest_ray.elements import elements_dataset
    from ingest_ray.spatial import pip_join_partitioned

    docs = _synth_docs_ds(sf_dir)
    areas = _synth_features(sf_dir).filter(expr="kind == 3").select_columns(
        ["key", "positions", "ring_offsets", "minx", "miny", "maxx", "maxy"]
    )
    pts = elements_dataset(docs, "node").select_columns(["id", "lon", "lat"]).rename_columns(
        {"id": "pid"}
    )
    out = pip_join_partitioned(pts, areas, keep_cols=("pid",), res=5)
    return out.select_columns(["pid", "poly_key"])


def q_knn_geo_part(sf_dir: str):
    """Cell-partitioned kNN join — the corpus is never collected or
    broadcast (equals knn_geo_synth, property-tested)."""
    import ray.data as rd

    from ingest_ray.elements import elements_dataset
    from ingest_ray.spatial import knn_join_partitioned

    docs = _synth_docs_ds(sf_dir)
    nodes = elements_dataset(docs, "node").select_columns(["id", "lon", "lat"])
    head = pa.Table.from_pylist(nodes.limit(50).take_all())
    queries = rd.from_arrow(
        pa.table(
            {
                "qid": head.column("id"),
                "lon": head.column("lon"),
                "lat": head.column("lat"),
            }
        )
    )
    return knn_join_partitioned(queries, nodes, k=3, res=8)


def q_raster_vector_part(sf_dir: str):
    """Distributed-join raster↔vector (chips as a Dataset; equals
    raster_vector_synth up to the exact cover, property-tested)."""
    import ray.data as rd

    from ingest_ray.spatial import raster_vector_join_partitioned, synth_raster_chips

    feats = _synth_features(sf_dir)
    chips = synth_raster_chips((138.0, 34.0, 141.0, 37.0), res=6)
    return raster_vector_join_partitioned(feats, rd.from_arrow(chips), res=6)


def q_media_features_synth(sf_dir: str):
    from ingest_ray.functions.multimodal import media_features

    return media_features(_synth_docs_ds(sf_dir))


def q_media_thumbnails_synth(sf_dir: str):
    """Actor-pool image resize stage (library-gated real path;
    deterministic fake decode) — schema evolution + batch sizing are
    the tested plumbing."""
    from ingest_ray.functions.multimodal import media_thumbnails

    return media_thumbnails(_synth_docs_ds(sf_dir), out_w=4, out_h=4).drop_columns(
        ["payload"]
    )


def q_video_frames_synth(sf_dir: str):
    """Actor-pool video frame sampling (in-batch explode: one row per
    sampled frame with index + timestamp)."""
    from ingest_ray.functions.multimodal import video_frames

    return video_frames(_synth_docs_ds(sf_dir), step=2).drop_columns(["frame"])


def q_span_invariant(sf_dir: str):
    """Per-document span-sequence hash survives explode→regroup (the
    per-row invariant of BASELINE.json input_hint)."""
    from ingest_ray.spans import explode_spans, span_sequence_hash
    from ingest_ray.util import hash64_str

    docs = _synth_docs_ds(sf_dir)

    def direct(batch: pa.Table) -> pa.Table:
        return span_sequence_hash(batch)

    def roundtrip(batch: pa.Table) -> pa.Table:
        spans = explode_spans(batch)
        df = spans.to_pandas().sort_values(["doc_id", "span_idx"])
        seqs = df.groupby("doc_id", sort=True).apply(
            lambda g: "\x1f".join(
                f"{k}\x1e{t}\x1e{m}" for k, t, m in zip(g["kind"], g["text"], g["media_ref"])
            ),
            include_groups=False,
        )
        return pa.table(
            {
                "doc_id": pa.array(seqs.index.to_list(), pa.string()),
                "rt_hash": pa.array(hash64_str(seqs.to_list()), pa.uint64()),
            }
        )

    a = docs.map_batches(direct, batch_format="pyarrow").to_pandas()
    b = docs.map_batches(roundtrip, batch_format="pyarrow").to_pandas()
    m = a.merge(b, on="doc_id", how="outer")
    m["ok"] = (m["span_seq_hash"] == m["rt_hash"]).astype("int64")
    return m[["doc_id", "ok"]]


def q_simhash_docs(sf_dir: str):
    from ingest_ray.functions.dedup import simhash_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pandas"
    )


def q_minhash_pairs_docs(sf_dir: str):
    from ingest_ray.functions.dedup import (
        minhash_lsh_candidates,
        verify_jaccard_pairs_distributed,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(docs, num_hashes=64, bands=16, distinct=False)
    # distributed verify: sketches shuffle by id, no corpus broadcast
    # and no driver-side table materialization
    return verify_jaccard_pairs_distributed(cands, docs, threshold=0.5).select_columns(
        ["a", "b"]
    )


def q_minhash_dedup_docs(sf_dir: str):
    """Near-dup cluster assignment (doc_id → keep_id): exact
    pre-collapse + LSH over representatives + union-find — the
    linear-output dedup surface (see dedup.minhash_dedup_assign)."""
    from ingest_ray.functions.dedup import minhash_dedup_assign

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_assign(docs, threshold=0.5)


def q_simhash_pairs_docs(sf_dir: str):
    from ingest_ray.functions.dedup import simhash_near_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_pairs(docs, max_hamming=3).select_columns(["a", "b", "hamming"])


def q_jaccard_dedup_docs(sf_dir: str):
    """Exactly-oracleable dedup CLUSTER assignment: edges = exact-text
    pairs ∪ all-pairs word-set Jaccard ≥0.8 (the oracled ngram_jaccard
    kernel), connected components via the distributed label
    propagation, keep_id = component minimum. The LSH variant
    (minhash_dedup_docs) has the same output contract but probabilistic
    candidate recall; this twin pins the whole assign machinery —
    components, star edges, isolated docs — against SQL."""
    import ray.data as rd

    from ingest_ray.functions.dedup import (
        label_propagation_components,
        ngram_jaccard_pairs,
    )
    from ingest_ray.util import hash64_str

    table = pa.parquet.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    near = ngram_jaccard_pairs(docs, table, threshold=0.8).select_columns(["a", "b"])

    # exact-text star edges: (doc, group min) per non-representative doc
    from ray.data.aggregate import Min

    def hash_stage(batch: pa.Table) -> pa.Table:
        h = hash64_str([t or "" for t in batch.column("text").to_pylist()])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_hash": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    hashed = docs.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    reps = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="rep"))
    member = hashed.join(
        reps.rename_columns({"text_hash": "th"}),
        join_type="inner",
        num_partitions=8,
        on=("text_hash",),
        right_on=("th",),
    ).materialize()
    star = member.filter(expr="doc_id != rep").map_batches(
        lambda t: pa.table(
            {"a": t.column("rep").cast(pa.int64()), "b": t.column("doc_id").cast(pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = label_propagation_components(near.union(star))
    joined = member.select_columns(["doc_id"]).join(
        labels,
        join_type="left_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("node",),
    )

    def pick(t: pa.Table) -> pa.Table:
        # stay in int64 end-to-end: the outer join's null labels are
        # coalesced in Arrow (a float64 round-trip would corrupt doc
        # ids >= 2^53 at the declared corpus scale)
        import pyarrow.compute as pc

        doc = t.column("doc_id").cast(pa.int64())
        lab = pc.coalesce(t.column("label").cast(pa.int64()), doc)
        return pa.table(
            {"doc_id": doc, "keep_id": pc.min_element_wise(doc, lab)}
        )

    return joined.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_id_docs(sf_dir: str):
    from ingest_ray.functions.text import lang_id_batch

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(lang_id_batch, batch_format="pandas")
        .select_columns(["doc_id", "lang_pred"])
    )


def q_fingerprint_docs(sf_dir: str):
    from ingest_ray.functions.text import fingerprint_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pandas"
    )


def q_lsh_ann(sf_dir: str):
    import ray.data as rd

    from ingest_ray.functions.ann import lsh_topk

    table = pa.parquet.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    queries = rd.from_arrow(table.filter(pa.compute.less(table.column("vec_id"), 4)))
    return lsh_topk(queries, table, k=5, nbits=6)


def q_ivf_ann(sf_dir: str):
    """IVF ANN over the embeddings table — Dataset corpus, one
    centroid-keyed shuffle, no broadcast (recall vs brute force is
    pinned by tests)."""
    import ray.data as rd

    from ingest_ray.functions.ann import ivf_topk

    corpus = _read(sf_dir, "embeddings")
    table = pa.parquet.read_table(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    queries_ds = rd.from_arrow(table.filter(pa.compute.less(table.column("vec_id"), 4)))
    return ivf_topk(queries_ds, corpus, k=5, nlist=32, nprobe=8)


def q3_shipping(sf_dir: str):
    """TPC-H Q3 analog (shipping priority): BUILDING-segment customers
    × orders before the cutoff × lineitems shipped after it; revenue
    = sum(extendedprice·(1−discount)) per order; top 10 by revenue.
    Plan: per-batch revenue pre-aggregation on the fact table BEFORE
    its join (combiner pushdown — lineitem is the big side), segment
    keys reduced to a key-only join input, two hash joins, grouped-sum,
    bounded top-k."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ingest_ray.util import effective_num_partitions, tune_shuffle_context

    tune_shuffle_context()
    np_eff = effective_num_partitions(8)
    CUT = pd.Timestamp("1998-06-01")

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), pa.scalar(CUT))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def li_revenue(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("l_shipdate"), pa.scalar(CUT))
        t = b.filter(keep)
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        part = pa.table({"l_orderkey": t.column("l_orderkey"), "rev": rev})
        # per-batch combiner: one row per orderkey per batch
        import numpy as np

        k = part.column("l_orderkey").to_numpy(zero_copy_only=False)
        v = part.column("rev").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]])) if len(ks) else np.empty(0, np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(ks[starts] if len(ks) else ks, pa.int64()),
                "rev": pa.array(
                    np.add.reduceat(vs, starts) if len(ks) else vs, pa.float64()
                ),
            }
        )

    li = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(li_revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    j = orders.join(cust, join_type="inner", num_partitions=np_eff, on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(li, join_type="inner", num_partitions=np_eff, on=("o_orderkey",), right_on=("l_orderkey",))
    out = j.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"])
    out = out.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(10)
    # round the ~1e5-magnitude float sums to 2 decimals AFTER the sort so
    # distributed summation-order noise can't flip the value-hash compare
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("revenue"),
            "revenue",
            pc.round(b.column("revenue"), 2),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 analog: ASIA-region revenue by nation where the
    supplying supplier and ordering customer share a nation — a
    six-table chain (region→nation→customer→orders→lineitem→supplier).
    Plan: the two tiny dimension tables reduce to an ASIA nation-key
    set applied as a FILTER before any join (never a shuffle); the
    customer and supplier joins carry only keys + nationkey; revenue
    is computed per batch; the same-nation predicate applies at the
    final join; one grouped-sum ends the chain."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ingest_ray.util import effective_num_partitions, tune_shuffle_context

    tune_shuffle_context()
    np_eff = effective_num_partitions(8)
    CUT0, CUT1 = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

    # driver-side broadcast of the ASIA nation set: region × nation is
    # dozens of rows by contract
    region = pa.parquet.read_table(os.path.join(sf_dir, "region.parquet"))
    region = region.filter(pc.equal(region.column("r_name"), "ASIA"))
    nation = pa.parquet.read_table(os.path.join(sf_dir, "nation.parquet"))
    asia_keys = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=region.column("r_regionkey"))
    )
    nk_set = pa.array(asia_keys.column("n_nationkey").to_pylist(), pa.int64())
    _nk = np.asarray(asia_keys.column("n_nationkey").to_pylist(), dtype=np.int64)
    _nname = np.asarray(asia_keys.column("n_name").to_pylist(), dtype=object)
    _order = np.argsort(_nk)
    nk_sorted, nname_sorted = _nk[_order], _nname[_order]

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_nationkey"), value_set=nk_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_nationkey"), value_set=nk_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), pa.scalar(CUT0)),
                pc.less(b.column("o_orderdate"), pa.scalar(CUT1)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def li_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "rev": rev,
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_rev, batch_format="pyarrow", zero_copy_batch=True)

    oc = orders.join(cust, join_type="inner", num_partitions=np_eff, on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(
        oc.select_columns(["o_orderkey", "c_nationkey"]),
        join_type="inner",
        num_partitions=np_eff,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    j = j.join(supp, join_type="inner", num_partitions=np_eff, on=("l_suppkey",), right_on=("s_suppkey",))

    def same_nation(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("c_nationkey"), b.column("s_nationkey")))
        keys = t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        names = pa.array(
            nname_sorted[np.searchsorted(nk_sorted, keys)], pa.string()
        )
        return pa.table({"n_name": names, "rev": t.column("rev")})

    out = (
        j.map_batches(same_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    # round ~1e7-magnitude float sums to 2 decimals so distributed
    # summation-order noise can't flip the value-hash compare
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("revenue"),
            "revenue",
            pc.round(b.column("revenue"), 2),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_kcenter_embeddings(sf_dir: str):
    """Greedy k-center diversity selection over the embeddings table
    (Gonzalez farthest-point, k=12): per round one streaming pass,
    one row per block on the wire, corpus never shuffles. Iterative,
    so no SQL oracle; pytest pins equality with a numpy reference."""
    from ingest_ray.functions.kcenter import kcenter_select

    return kcenter_select(_read(sf_dir, "embeddings"), k=12)


def q_quality_filter_docs(sf_dir: str):
    """Per-language quality-threshold filter: keep documents whose
    n_chars is at or above their language's exact median
    (quantile_disc rank). Thresholds = one row per language →
    broadcast once; the corpus never shuffles."""
    from ingest_ray.functions.grouped import filter_by_group_quantile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return filter_by_group_quantile(docs, key="lang", value="n_chars", q=0.5)


def q_kmeans_embeddings(sf_dir: str):
    """Distributed k-means over the embeddings table (Lloyd's, 6
    rounds, k=8): centroids broadcast per round, one streaming pass of
    per-batch partial sums — no shuffle, O(k*dim) driver state.
    Iterative, so no SQL oracle; pytest pins bit-level agreement with
    a numpy reference (tests/test_kmeans.py)."""
    from ingest_ray.functions.kmeans import kmeans

    return kmeans(_read(sf_dir, "embeddings"), k=8, n_iters=6)


def q_anti_join_customers(sf_dir: str):
    """Customers with no order above 450k — distributed NOT EXISTS
    (broadcast distinct-key plan here; the >limit plan is the
    tagged-union groupby, property-tested equal in tests)."""
    import pyarrow.compute as pc

    from ingest_ray.functions.relational import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 450000.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return anti_join(cust, orders, left_key="c_custkey", right_key="o_custkey")


def q_semi_join_customers(sf_dir: str):
    """Customers with ≥1 order — distributed EXISTS."""
    from ingest_ray.functions.relational import semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return semi_join(cust, orders, left_key="c_custkey", right_key="o_custkey")


def q_semi_join_bloom_customers(sf_dir: str):
    """Same EXISTS, via the Bloom pre-filter + exact verify — the
    planet-scale left-side plan (the filter is fixed-size bits however
    large the build side; false positives die in the verify pass).
    Forced through the distributed verify plan so the whole path is
    exchange-based."""
    from ingest_ray.functions.relational import semi_join_bloom

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return semi_join_bloom(
        cust,
        orders,
        left_key="c_custkey",
        right_key="o_custkey",
        num_bits=1 << 20,
        broadcast_limit=0,
    )


def _cust_pts(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Key-derived coordinates shared by the geo oracle twins — integer
    arithmetic then one division, so numpy and DuckDB produce the SAME
    float64s bit for bit."""
    return (k * 9973 % 36000) / 100.0 - 180.0, (k * 9949 % 18000) / 100.0 - 90.0


def q_radius_customers(sf_dir: str):
    """Within-radius distance join over key-derived customer points
    (queries = c_custkey ≤ 20, corpus = all customers, r = 12.0) — the
    DuckDB-oracled twin of the grid-partitioned radius join. Both
    sides stream; each pair meets in exactly one grid cell."""
    import pyarrow.compute as pc

    from ingest_ray.spatial import radius_join

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def pts_side(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _cust_pts(k)
        return pa.table(
            {
                "id": pa.array(k, pa.int64()),
                "lon": pa.array(x, pa.float64()),
                "lat": pa.array(y, pa.float64()),
            }
        )

    points = cust.map_batches(pts_side, batch_format="pyarrow", zero_copy_batch=True)
    queries = cust.map_batches(
        lambda b: pts_side(b.filter(pc.less_equal(b.column("c_custkey"), 20))).rename_columns(
            ["qid", "lon", "lat"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return radius_join(points, queries, 12.0)


def q_bbox_join_customers(sf_dir: str):
    """Rectangle-intersection join over key-derived customer boxes
    (left = c_custkey ≤ 200, right = all) — the DuckDB-oracled twin of
    the PBSM bbox-overlap join with reference-point dedup."""
    import pyarrow.compute as pc

    from ingest_ray.spatial import bbox_overlap_join

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def rect_side(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = _cust_pts(k)
        hw = (k * 31 % 97) / 10.0 + 0.05
        hh = (k * 57 % 89) / 10.0 + 0.05
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "minx": pa.array(cx - hw, pa.float64()),
                "miny": pa.array(cy - hh, pa.float64()),
                "maxx": pa.array(cx + hw, pa.float64()),
                "maxy": pa.array(cy + hh, pa.float64()),
            }
        )

    right = cust.map_batches(rect_side, batch_format="pyarrow", zero_copy_batch=True)
    left = cust.map_batches(
        lambda b: rect_side(b.filter(pc.less_equal(b.column("c_custkey"), 200))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bbox_overlap_join(left, right, cell=16.0)


def q_sample_weighted_docs(sf_dir: str):
    """Length-weighted deterministic sampling: inclusion probability
    min(1, 0.0025·len(text)) as a pure function of doc_id — the
    quality/length-weighted curation op; oracled via the same
    splitmix64 chain + one IEEE-identical float comparison."""
    import pyarrow.compute as pc

    from ingest_ray.functions.sampling import weighted_sample

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "w": pc.utf8_length(b.column("text")).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return weighted_sample(docs, key="doc_id", weight_col="w", rate=0.0025)


def q_simplify_synth(sf_dir: str):
    """RDP polyline simplification over the synth corpus's line/area
    features (eps in f32 coordinate units) — the low-zoom geometry
    pass; rows-only (geo), invariants pinned in pytest."""
    import pyarrow.compute as pc

    from ingest_ray.simplify import simplify_lines

    feats = _synth_features(sf_dir).map_batches(
        lambda b: b.filter(pc.greater(pc.list_value_length(b.column("positions")), 4)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = simplify_lines(feats, eps=0.01)
    return out.select_columns(["key", "n_pts", "n_kept"])


def q_lag_events(sf_dir: str):
    """Per-event microseconds since the same user's previous event —
    the LAG window primitive (one hash exchange, per-bucket lexsort +
    shifted subtraction); oracled vs SQL LAG OVER."""
    from ingest_ray.functions.temporal import lag_delta

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_delta(ev, key="user_id", ts="ts", tiebreak="event_id").select_columns(
        ["event_id", "user_id", "lag_us"]
    )


def q_quantiles_by_event_type(sf_dir: str):
    """Exact per-group quantiles (quantile_disc ranks) — one exchange,
    one lexsort per bucket, vectorized rank pick per group segment."""
    from ingest_ray.functions.grouped import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles(ev, key="event_type", value="value")


def q_pivot_events(sf_dir: str):
    """user_id × event_type count pivot — per-batch wide combiner, one
    groupby-sum; category set discovered with a bounded driver merge.
    Oracled vs CASE-WHEN sums."""
    from ingest_ray.functions.pivot import pivot_counts

    return pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        row_key="user_id",
        cat_col="event_type",
    )


def q_heavy_custkeys_orders(sf_dir: str):
    """Customers with ≥ 16 orders — exact distributed heavy hitters
    (combiner pre-aggregation, one small groupby). The Misra-Gries
    sketch twin is pinned against this in pytest."""
    from ingest_ray.functions.stats import exact_heavy_hitters

    return exact_heavy_hitters(
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey", min_count=16
    )


def q_shuffle_docs(sf_dir: str):
    """Deterministic global shuffle position per doc — dense
    permutation ordered by splitmix64(doc_id), oracled against a SQL
    row_number over the same integer hash chain."""
    from ingest_ray.functions.packing import global_shuffle_order

    return global_shuffle_order(_read(sf_dir, "documents", ["doc_id"]))


def q_cluster_customers(sf_dir: str):
    """Grid-density spatial clustering (GriDBSCAN-style): customers
    land in integer grid cells (pure key arithmetic, exact in SQL
    too); 8-connected occupied-cell components — driver union-find on
    the contracted cell graph below the edge threshold, distributed
    pointer-jumping label propagation above it; every point labeled
    with its component's minimum packed cell id. DuckDB-oracled
    against a recursive-CTE transitive closure."""
    from ingest_ray.clustering import grid_cluster

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cells(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "gx": pa.array((k * 9973 % 36000) // 300, pa.int64()),
                "gy": pa.array((k * 9949 % 18000) // 300, pa.int64()),
            }
        )

    pts = cust.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True)
    return grid_cluster(pts)


def q_segment_join_customers(sf_dir: str):
    """Exact segment-intersection join over key-derived integer
    segments (left = c_custkey ≤ 250, right = all): PBSM grid explode
    + reference-point dedup, CLRS orientation predicate after the
    bbox prefilter. Integer coordinates make the cross products exact
    in both numpy int64/float64 and DuckDB BIGINT — the SQL twin is
    the same predicate verbatim."""
    import pyarrow.compute as pc

    from ingest_ray.spatial import segment_intersection_join

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def seg_side(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ax = (k * 73) % 2001
        ay = (k * 149) % 2001
        bx = ax + (k * 37) % 401 - 200
        by = ay + (k * 53) % 401 - 200
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "ax": pa.array(ax.astype(np.float64), pa.float64()),
                "ay": pa.array(ay.astype(np.float64), pa.float64()),
                "bx": pa.array(bx.astype(np.float64), pa.float64()),
                "by": pa.array(by.astype(np.float64), pa.float64()),
            }
        )

    right = cust.map_batches(seg_side, batch_format="pyarrow", zero_copy_batch=True)
    left = cust.map_batches(
        lambda b: seg_side(b.filter(pc.less_equal(b.column("c_custkey"), 250))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return segment_intersection_join(left, right, cell=50.0)


def q_chunk_docs(sf_dir: str):
    """Fixed-window token chunking with overlap (window 32, overlap 8)
    — zero-shuffle, Arrow-vectorized; DuckDB-oracled chunk for chunk
    (ids, sizes, and reassembled text)."""
    from ingest_ray.functions.chunking import chunk_documents

    return chunk_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]), window=32, overlap=8
    )


def q_span_dedup_docs(sf_dir: str):
    """Span-level exact dedup with reassembly (the C4/RefinedWeb
    repeated-span hygiene step): split each doc into 2-token word
    windows, keep each distinct span only at its globally first
    (doc_id, ord) occurrence, drop the rest, and rebuild surviving
    docs in order. Two bounded exchanges (span-hash buckets, then
    doc-hash buckets), per-batch combiner pre-dedup bounds hot spans
    at one exchange row per input batch. DuckDB-oracled end to end
    (rebuilt text + kept-span counts)."""
    from ingest_ray.functions.span_dedup import dedup_spans

    return dedup_spans(_read(sf_dir, "documents", ["doc_id", "text"]), window=2)


def q_repetition_docs(sf_dir: str):
    """Gopher/MassiveText repetition quality signals per document:
    token count, distinct-token count, top word-bigram occurrence
    count, and bigram total — integer numerators/denominators of the
    published duplicate-token and top-2-gram fractions, so the DuckDB
    twin hash-matches exactly. Zero shuffles; per-batch Arrow C sorts,
    no token hashing (string-exact distinct counts)."""
    from ingest_ray.functions.repetition import repetition_stats

    return repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_decontam_docs(sf_dir: str):
    """Benchmark decontamination: flag documents sharing any word
    8-gram with a 'benchmark' subset (doc_id % 101 == 0 stands in for
    the eval set). Broadcast blocklist (one ray.put, zero shuffles),
    distributed twin property-tested in pytest; DuckDB-oracled via an
    explode + string join."""
    from ingest_ray.functions.decontam import decontaminate

    def bench_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 0))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        bench_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return decontaminate(docs, bench, n=8)


def q_distinct_custkeys_orders(sf_dir: str):
    """Exact distributed COUNT(DISTINCT): per-batch pre-dedup, one
    hash-bucket exchange, driver sums 64 scalars. (The approximate
    HLL twin is pinned against this in pytest.)"""
    from ingest_ray.functions.stats import distinct_count

    n = distinct_count(_read(sf_dir, "orders", ["o_custkey"]), "o_custkey")
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def q_normalize_docs(sf_dir: str):
    from ingest_ray.functions.text import normalize_text_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        normalize_text_batch, batch_format="pandas"
    )


def q_top_terms_docs(sf_dir: str):
    """Each doc's top-3 terms by tf·(N−df) — integer-exact tf-idf
    surrogate; df attach broadcast below the vocab limit."""
    from ingest_ray.functions.terms import top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return top_terms(docs, k=3)


def q_sample_stratified_docs(sf_dir: str):
    """Deterministic per-language downsample: en 25%, others 60% —
    membership is splitmix64(doc_id) vs the stratum threshold, so
    re-runs (and the SQL twin) select the SAME rows."""
    from ingest_ray.functions.sampling import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        docs, key="doc_id", strata_col="lang", rates={"en": 0.25}, default_rate=0.6
    )


def q_sample_per_lang_docs(sf_dir: str):
    """Exactly 50 docs per language, deterministically — balanced-mix
    sampling via top-50 per stratum by splitmix64(doc_id)."""
    from ingest_ray.functions.sampling import per_stratum_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return per_stratum_sample(docs, strata_col="lang", key="doc_id", n=50)


def q_pack_sequences_docs(sf_dir: str):
    """Global token offsets + training-sequence assignment for every
    doc — the distributed prefix-sum (range-bucket scan); oracled
    against a SQL window cumsum."""
    from ingest_ray.functions.packing import pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(docs, seq_len=2048)


def q_quantiles_orders(sf_dir: str):
    """Exact p50/p90/p99 of order totals — iterative range-refinement
    quantiles (histogram passes + bounded final collect); the result
    is an actual column element, hash-equal to quantile_disc."""
    from ingest_ray.functions.quantiles import quantiles_table

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return quantiles_table(
        orders, col="o_totalprice", qs=(0.5, 0.9, 0.99), names=("p50", "p90", "p99")
    )


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: the driver's CORRECTNESS file records the FIRST
    # 50 registry entries, so positions 1-50 hold the 50 highest-value
    # SQL-oracled queries (one per operator family). Positions 51-55 are
    # the remaining oracled entries whose operator family already has an
    # oracled representative inside the window (token pieces vs token
    # count, plain semi-join vs bloom semi-join, per-stratum vs
    # stratified sampling, square-grid vs hex cells, pairwise n-gram
    # jaccard vs the jaccard dedup pipeline); rows-only entries follow.
    return {
        # relational / generic operators (SQL-oracled)
        "q1_lineitem": q_q1_lineitem,
        "join_customer_orders": q_join_customer_orders,
        "filter_project": q_filter_project,
        "topk_orders": q_topk_orders,
        "window_events": q_window_events,
        "sessionize_events": q_sessionize_events,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "asof_events_orders": q_asof_events_orders,
        "range_orders_lineitem": q_range_orders_lineitem,
        "sliding_window_events": q_sliding_window_events,
        "topk_orders_per_cust": q_topk_orders_per_cust,
        "quality": q_quality,
        "anti_join_customers": q_anti_join_customers,
        "semi_join_bloom_customers": q_semi_join_bloom_customers,
        "radius_customers": q_radius_customers,
        "bbox_join_customers": q_bbox_join_customers,
        "segment_join_customers": q_segment_join_customers,
        "cluster_customers": q_cluster_customers,
        "chunk_docs": q_chunk_docs,
        "span_dedup_docs": q_span_dedup_docs,
        "repetition_docs": q_repetition_docs,
        "decontam_docs": q_decontam_docs,
        "distinct_custkeys_orders": q_distinct_custkeys_orders,
        "shuffle_docs": q_shuffle_docs,
        "pivot_events": q_pivot_events,
        "heavy_custkeys_orders": q_heavy_custkeys_orders,
        "lag_events": q_lag_events,
        "quantiles_by_event_type": q_quantiles_by_event_type,
        "sample_weighted_docs": q_sample_weighted_docs,
        "normalize_docs": q_normalize_docs,
        "top_terms_docs": q_top_terms_docs,
        "sample_stratified_docs": q_sample_stratified_docs,
        "pack_sequences_docs": q_pack_sequences_docs,
        "quantiles_orders": q_quantiles_orders,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_topk": q_ann_topk,
        "hex_cell_customers": q_hex_cell_customers,
        "knn_customers": q_knn_customers,
        "pip_customers": q_pip_customers,
        "simhash_docs": q_simhash_docs,
        "simhash_pairs_docs": q_simhash_pairs_docs,
        "jaccard_dedup_docs": q_jaccard_dedup_docs,
        "minhash_pairs_docs": q_minhash_pairs_docs,
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "lang_id_docs": q_lang_id_docs,
        "fingerprint_docs": q_fingerprint_docs,
        "quality_filter_docs": q_quality_filter_docs,
        "q3_shipping": q3_shipping,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        # SQL-oracled twins of in-window operator families (51-55)
        "token_pieces_docs": q_token_pieces,
        "semi_join_customers": q_semi_join_customers,
        "sample_per_lang_docs": q_sample_per_lang_docs,
        "grid_cell_customers": q_grid_cell_customers,
        "ngram_jaccard": q_ngram_jaccard,
        # geo / sketch operators (rows-only)
        "simplify_synth": q_simplify_synth,
        "zoom_pyramid_synth": q_zoom_pyramid_synth,
        "ingest_synth": q_ingest_synth,
        "golden_features": q_golden_features,
        "tiles_synth": q_tiles_synth,
        "tiles_aggregated_synth": q_tiles_aggregated_synth,
        "tiles_store_aggregated": q_tiles_store_aggregated,
        "changeset_golden": q_changeset_golden,
        "changeset_o5c": q_changeset_o5c,
        "patch_tiles_store": q_patch_tiles_store,
        "cells_synth": q_cells_synth,
        "knn_geo_synth": q_knn_geo_synth,
        "pip_geo_synth": q_pip_geo_synth,
        "raster_vector_synth": q_raster_vector_synth,
        "pip_geo_part": q_pip_geo_part,
        "knn_geo_part": q_knn_geo_part,
        "raster_vector_part": q_raster_vector_part,
        "media_features_synth": q_media_features_synth,
        "media_thumbnails_synth": q_media_thumbnails_synth,
        "video_frames_synth": q_video_frames_synth,
        "span_invariant": q_span_invariant,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "kmeans_embeddings": q_kmeans_embeddings,
        "kcenter_embeddings": q_kcenter_embeddings,
    }


def _hex_cell_oracle_sql() -> str:
    """SQL twin of cells.hex_cell at res 7: same axial transform, cube
    rounding and id packing. The float constants are inlined via repr()
    so DuckDB parses the EXACT doubles numpy uses (bit-for-bit hash
    match; np.round vs round() differ only at exact .5 fractions, which
    the irrational scalings cannot produce from 2-decimal inputs)."""
    import numpy as _np

    sqrt3_over_3 = repr(float(_np.sqrt(3.0) / 3.0))
    from ingest_ray.cells import _hex_size

    s = repr(float(_hex_size(7)))
    return f"""
        WITH pts AS (
          SELECT (c_custkey * 9973 % 36000) / 100.0 - 180.0 AS px,
                 (c_custkey * 9949 % 18000) / 100.0 - 90.0 AS py
          FROM customer),
        ax AS (
          SELECT ({sqrt3_over_3} * px - py / 3.0) / {s} AS qf,
                 ((2.0 / 3.0) * py) / {s} AS rf
          FROM pts),
        rounded AS (
          SELECT qf, rf, -qf - rf AS yf,
                 round(qf) AS rx, round(-qf - rf) AS ry, round(rf) AS rz
          FROM ax),
        fixed AS (
          SELECT CASE WHEN abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf)
                      THEN -ry - rz ELSE rx END AS q,
                 CASE WHEN NOT (abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf))
                           AND abs(rz - rf) > abs(ry - yf)
                      THEN -rx - ry ELSE rz END AS r
          FROM rounded)
        SELECT (7 * 72057594037927936 + (CAST(q AS BIGINT) + 67108864) * 268435456
                + (CAST(r AS BIGINT) + 67108864)) AS cell,
               count(*) AS n
        FROM fixed GROUP BY cell
    """


def _lang_id_oracle_sql() -> str:
    """SQL twin of functions.text.lang_id_batch: distinct lowered
    whitespace tokens ⋈ the stopword lists, score = |hits|/|list|,
    winner by (score, lang) descending — matching Python's
    max(..., key=(score, lang)) tie-break; zero hits → 'und'."""
    from ingest_ray.functions.text import _LANG_STOPWORDS

    vals = ",".join(
        f"('{l}', '{w}')" for l, sws in sorted(_LANG_STOPWORDS.items()) for w in sorted(sws)
    )
    sizes = ",".join(f"('{l}', {len(sws)})" for l, sws in sorted(_LANG_STOPWORDS.items()))
    return f"""
        WITH sw(lang, word) AS (VALUES {vals}),
        sz(lang, n_sw) AS (VALUES {sizes}),
        words AS (
          SELECT doc_id, lower(unnest(string_split_regex(trim(coalesce(text,'')), '\\s+'))) AS w
          FROM documents
          WHERE trim(coalesce(text,'')) <> ''
        ),
        dw AS (SELECT DISTINCT doc_id, w FROM words),
        hits AS (
          SELECT d.doc_id, s.lang, count(*) AS n
          FROM dw d JOIN sw s ON d.w = s.word
          GROUP BY d.doc_id, s.lang
        ),
        scores AS (
          SELECT docs.doc_id, sz.lang,
                 coalesce(h.n, 0) * 1.0 / sz.n_sw AS score
          FROM (SELECT DISTINCT doc_id FROM documents) docs
          CROSS JOIN sz
          LEFT JOIN hits h ON h.doc_id = docs.doc_id AND h.lang = sz.lang
        ),
        best AS (
          SELECT doc_id, lang, score,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
          FROM scores
        )
        SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
        FROM best WHERE rn = 1
    """


# FNV-1a 64 as a SQL fragment: DuckDB has no byte indexing on BLOB, so
# the UTF-8 bytes come from hex(encode(text)) two chars at a time via a
# 256-row hex-pair lookup, and the sequential fold is a recursive CTE
# with the 64-bit wraparound multiply done in HUGEINT mod 2^64.
# Byte-identical to ingest_ray.util.hash64_str (verified 500/500).
_FNV_PRELUDE = """
hexmap AS (SELECT printf('%02X', r) AS pair, r::UBIGINT AS v FROM range(256) t(r))
"""


def _fingerprint_oracle_sql() -> str:
    """SQL twin of functions.text.fingerprint_batch: FNV-1a over each
    document's full UTF-8 text."""
    return f"""
        WITH RECURSIVE
        {_FNV_PRELUDE},
        d AS (SELECT doc_id, hex(encode(coalesce(text,''))) AS hx FROM documents),
        bytes AS (
          SELECT d.doc_id, i.i, hm.v
          FROM d
          JOIN LATERAL (SELECT unnest(range(1, length(hx)//2 + 1)) AS i) i ON true
          JOIN hexmap hm ON substring(d.hx, (2*i.i-1)::BIGINT, 2) = hm.pair
        ),
        lens AS (SELECT doc_id, length(hx)//2 AS n FROM d),
        fnv(doc_id, i, h) AS (
          SELECT doc_id, 0::BIGINT, CAST(14695981039346656037 AS UBIGINT) FROM d
          UNION ALL
          SELECT f.doc_id, f.i+1,
            CAST((CAST(xor(f.h, b.v) AS HUGEINT) * 1099511628211)
                 % 18446744073709551616 AS UBIGINT)
          FROM fnv f JOIN bytes b ON b.doc_id = f.doc_id AND b.i = f.i+1
        )
        SELECT f.doc_id, f.h AS fp
        FROM fnv f JOIN lens l ON f.doc_id = l.doc_id AND f.i = l.n
    """


def _simhash_oracle_sql() -> str:
    """SQL twin of functions.dedup.simhash_batch: FNV-1a per DISTINCT
    whitespace token (recursive fold over the word's bytes — words are
    short, so the recursion is shallow), every occurrence votes ±1 on
    each of the 64 bits, packed bit b set iff its vote sum > 0; docs
    with no words hash to 0."""
    return f"""
        WITH RECURSIVE
        {_FNV_PRELUDE},
        occ AS (
          SELECT doc_id, unnest(string_split_regex(trim(coalesce(text,'')), '\\s+')) AS w
          FROM documents WHERE trim(coalesce(text,'')) <> ''
        ),
        wd AS (SELECT w, hex(encode(w)) AS hx FROM (SELECT DISTINCT w FROM occ)),
        bytes AS (
          SELECT wd.w, i.i, hm.v
          FROM wd
          JOIN LATERAL (SELECT unnest(range(1, length(hx)//2 + 1)) AS i) i ON true
          JOIN hexmap hm ON substring(wd.hx, (2*i.i-1)::BIGINT, 2) = hm.pair
        ),
        lens AS (SELECT w, length(hx)//2 AS n FROM wd),
        fnv(w, i, h) AS (
          SELECT w, 0::BIGINT, CAST(14695981039346656037 AS UBIGINT) FROM wd
          UNION ALL
          SELECT f.w, f.i+1,
            CAST((CAST(xor(f.h, b.v) AS HUGEINT) * 1099511628211)
                 % 18446744073709551616 AS UBIGINT)
          FROM fnv f JOIN bytes b ON b.w = f.w AND b.i = f.i+1
        ),
        wh AS (SELECT f.w, f.h FROM fnv f JOIN lens l ON f.w = l.w AND f.i = l.n),
        votes AS (
          SELECT o.doc_id, b.b,
                 sum(CASE WHEN (wh.h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM occ o JOIN wh ON o.w = wh.w
          CROSS JOIN (SELECT unnest(range(64)) AS b) b
          GROUP BY o.doc_id, b.b
        ),
        packed AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END)
                      % 18446744073709551616 AS UBIGINT) AS simhash
          FROM votes GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(p.simhash, 0) AS simhash
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN packed p ON d.doc_id = p.doc_id
    """


def _sm_chain_sql(src: str, keys: list[str], xexpr: str, out: str) -> str:
    """Nested-subquery SQL computing ``out = splitmix64(xexpr)`` over
    relation ``src`` carrying ``keys`` through — each 64×64 multiply
    mod 2⁶⁴ decomposed into 32-bit halves (HUGEINT holds only 127 bits,
    not the full 128-bit product). Same decomposition as
    :func:`_splitmix_docs_cte`, generalized so the minhash oracle can
    mix arbitrary columns."""
    ks = ", ".join(keys)
    m = "18446744073709551616"

    def mul(a: str, hi: int, lo: int) -> str:
        return (
            f"CAST(((CAST({a} AS HUGEINT) * {lo}) % {m}"
            f" + (((CAST({a} AS HUGEINT) % 4294967296) * {hi}) % 4294967296)"
            f" * 4294967296) % {m} AS UBIGINT)"
        )

    return f"""(
      SELECT {ks}, xor(z2, z2 >> 31) AS {out} FROM (
        SELECT {ks}, {mul("xor(z1, z1 >> 27)", 2496678331, 321982955)} AS z2 FROM (
          SELECT {ks}, {mul("xor(z0, z0 >> 30)", 3210233709, 484763065)} AS z1 FROM (
            SELECT {ks}, CAST((CAST({xexpr} AS HUGEINT) + 11400714819323198485) % {m} AS UBIGINT) AS z0
            FROM {src}
          )
        )
      )
    )"""


def _minhash_verified_pairs_ctes(dn_body: str) -> str:
    """The shared CTE chain computing verified near-dup pairs over a
    caller-supplied (doc_id, t) relation ``dn_body``: word 3-gram
    shingles (FNV-1a word hashes folded with the FNV prime,
    splitmix-finalized), 64 MinHash rows (min over
    splitmix64(shingle ^ seed_j)), 16 banded xor-fold bucket hashes,
    candidate pairs sharing a (band, bucket), exact shingle-set
    Jaccard ≥ 0.5 verify → ``vpairs(a, b)``. Bucket capping
    (bucket_cap=4096) never engages at sf≤0.1 corpus sizes, so the
    uncapped SQL expansion is exact there. Callers prepend
    ``WITH RECURSIVE {_FNV_PRELUDE},`` and append their final SELECT."""
    fnv_mul = (
        "CAST((CAST({x} AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)"
    )
    return f"""
        dn AS ({dn_body}),
        wl AS (SELECT doc_id, string_split_regex(t, '\\s+') AS l FROM dn WHERE t <> ''),
        occ AS (
          SELECT wl.doc_id, i.i AS pos, wl.l[i.i] AS w
          FROM wl JOIN LATERAL (SELECT unnest(range(1, len(l)+1)) AS i) i ON true
        ),
        wd AS (SELECT w, hex(encode(w)) AS hx FROM (SELECT DISTINCT w FROM occ)),
        bytes AS (
          SELECT wd.w, i.i, hm.v
          FROM wd
          JOIN LATERAL (SELECT unnest(range(1, length(hx)//2 + 1)) AS i) i ON true
          JOIN hexmap hm ON substring(wd.hx, (2*i.i-1)::BIGINT, 2) = hm.pair
        ),
        wlens AS (SELECT w, length(hx)//2 AS n FROM wd),
        fnv(w, i, h) AS (
          SELECT w, 0::BIGINT, CAST(14695981039346656037 AS UBIGINT) FROM wd
          UNION ALL
          SELECT f.w, f.i+1, {fnv_mul.format(x="xor(f.h, b.v)")}
          FROM fnv f JOIN bytes b ON b.w = f.w AND b.i = f.i+1
        ),
        wh AS (SELECT f.w, f.h FROM fnv f JOIN wlens l ON f.w = l.w AND f.i = l.n),
        occh AS (SELECT o.doc_id, o.pos, wh.h FROM occ o JOIN wh ON o.w = wh.w),
        nw AS (SELECT doc_id, max(pos) AS n FROM occh GROUP BY doc_id),
        gstart AS (
          SELECT nw.doc_id, i.i AS gpos
          FROM nw JOIN LATERAL (SELECT unnest(range(1, greatest(n-2,1)+1)) AS i) i ON true
        ),
        acc1 AS (
          SELECT g.doc_id, g.gpos, {fnv_mul.format(x="o1.h")} AS acc
          FROM gstart g JOIN occh o1 ON o1.doc_id = g.doc_id AND o1.pos = g.gpos
        ),
        acc2 AS (
          SELECT a.doc_id, a.gpos,
                 CASE WHEN o2.h IS NULL THEN a.acc
                      ELSE {fnv_mul.format(x="xor(a.acc, o2.h)")} END AS acc
          FROM acc1 a LEFT JOIN occh o2 ON o2.doc_id = a.doc_id AND o2.pos = a.gpos+1
        ),
        acc3 AS (
          SELECT a.doc_id, a.gpos,
                 CASE WHEN o3.h IS NULL THEN a.acc
                      ELSE {fnv_mul.format(x="xor(a.acc, o3.h)")} END AS acc
          FROM acc2 a LEFT JOIN occh o3 ON o3.doc_id = a.doc_id AND o3.pos = a.gpos+2
        ),
        sh AS (
          SELECT DISTINCT doc_id, s
          FROM {_sm_chain_sql("acc3", ["doc_id"], "acc", "s")}
        ),
        seeds AS (
          SELECT j, CAST((CAST(j+1 AS HUGEINT) * 11400714819323198485)
                         % 18446744073709551616 AS UBIGINT) AS seed
          FROM (SELECT unnest(range(64)) AS j)
        ),
        sx AS (SELECT sh.doc_id, seeds.j, xor(sh.s, seeds.seed) AS x
               FROM sh CROSS JOIN seeds),
        sig AS (
          SELECT doc_id, j, min(h) AS sig
          FROM {_sm_chain_sql("sx", ["doc_id", "j"], "x", "h")}
          GROUP BY doc_id, j
        ),
        bandx AS (
          SELECT doc_id, (j // 4)::BIGINT AS band,
                 xor(bit_xor(sig), CAST((j // 4) * 1315423911 AS UBIGINT)) AS x
          FROM sig GROUP BY doc_id, j // 4
        ),
        bh AS (
          SELECT doc_id, band, h AS bh
          FROM {_sm_chain_sql("bandx", ["doc_id", "band"], "x", "h")}
        ),
        cands AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bh x JOIN bh y
            ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.a, c.b, count(*) AS i
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.a
          JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
          GROUP BY c.a, c.b
        ),
        vpairs AS (
          SELECT c.a, c.b
          FROM cands c
          JOIN sizes na ON na.doc_id = c.a
          JOIN sizes nb ON nb.doc_id = c.b
          LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
          WHERE coalesce(i.i, 0)::DOUBLE / (na.n + nb.n - coalesce(i.i, 0)) >= 0.5
        )
    """


def _minhash_pairs_oracle_sql() -> str:
    """SQL twin of q_minhash_pairs_docs (see
    :func:`_minhash_verified_pairs_ctes` for the hash chain)."""
    chain = _minhash_verified_pairs_ctes(
        "SELECT doc_id::BIGINT AS doc_id, trim(coalesce(text,'')) AS t FROM documents"
    )
    return f"""
        WITH RECURSIVE
        {_FNV_PRELUDE},
        {chain}
        SELECT a, b FROM vpairs
    """


def _minhash_dedup_oracle_sql() -> str:
    """SQL twin of q_minhash_dedup_docs (near-dup CLUSTER assignment):
    exact pre-collapse (rep = min doc_id per identical text), the
    verified-pairs chain over REP docs only, connected components via
    a recursive-CTE closure (same pattern as the cluster_customers
    oracle), keep_id = component minimum composed with the exact-dup
    mapping. Ray groups identical texts by 64-bit FNV; the SQL groups
    by the text itself — equal absent a 64-bit collision."""
    chain = _minhash_verified_pairs_ctes(
        "SELECT rep AS doc_id, trim(t) AS t FROM groups"
    )
    return f"""
        WITH RECURSIVE
        {_FNV_PRELUDE},
        groups AS (
          SELECT coalesce(text,'') AS t, min(doc_id::BIGINT) AS rep
          FROM documents GROUP BY coalesce(text,'')
        ),
        docrep AS (
          SELECT d.doc_id::BIGINT AS doc_id, g.rep
          FROM documents d JOIN groups g ON coalesce(d.text,'') = g.t
        ),
        {chain},
        uedges AS (
          SELECT a, b FROM vpairs UNION ALL SELECT b AS a, a AS b FROM vpairs
        ),
        reach(id, label) AS (
          SELECT rep, rep FROM groups
          UNION
          SELECT e.a, r.label FROM uedges e JOIN reach r ON r.id = e.b
        ),
        comp AS (SELECT id, min(label) AS keep FROM reach GROUP BY id)
        SELECT d.doc_id, c.keep AS keep_id
        FROM docrep d JOIN comp c ON d.rep = c.id
    """


def _splitmix_docs_cte() -> str:
    """CTE chain computing h = splitmix64(doc_id) over documents in
    integer SQL — each 64×64 multiply mod 2⁶⁴ decomposed into 32-bit
    halves (HUGEINT can't hold the full product). Shared by the
    sampling oracles so SQL and Ray hash the SAME integers."""
    return """
        WITH s0 AS (
          SELECT doc_id, lang,
                 CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
                      % 18446744073709551616 AS UBIGINT) AS z0
          FROM documents),
        m1 AS (SELECT doc_id, lang, xor(z0, z0 >> 30) AS a1 FROM s0),
        s1 AS (SELECT doc_id, lang,
                CAST(((CAST(a1 AS HUGEINT) * 484763065) % 18446744073709551616
                 + (((CAST(a1 AS HUGEINT) % 4294967296) * 3210233709) % 4294967296)
                   * 4294967296) % 18446744073709551616 AS UBIGINT) AS z1 FROM m1),
        m2 AS (SELECT doc_id, lang, xor(z1, z1 >> 27) AS a2 FROM s1),
        s2 AS (SELECT doc_id, lang,
                CAST(((CAST(a2 AS HUGEINT) * 321982955) % 18446744073709551616
                 + (((CAST(a2 AS HUGEINT) % 4294967296) * 2496678331) % 4294967296)
                   * 4294967296) % 18446744073709551616 AS UBIGINT) AS z2 FROM m2),
        hv AS (SELECT doc_id, lang, xor(z2, z2 >> 31) AS h FROM s2)
    """


def _sample_stratified_oracle_sql() -> str:
    """SQL twin of sampling.stratified_sample — thresholds imported
    from the SAME _threshold the Ray side uses so both compare
    against identical integers."""
    from ingest_ray.functions.sampling import _threshold

    cut_en = int(_threshold(0.25))
    cut_def = int(_threshold(0.6))
    return f"""
        {_splitmix_docs_cte()}
        SELECT doc_id, lang FROM hv
        WHERE h < CASE WHEN lang = 'en' THEN CAST({cut_en} AS UBIGINT)
                       ELSE CAST({cut_def} AS UBIGINT) END
    """


def _sample_per_lang_oracle_sql() -> str:
    """SQL twin of sampling.per_stratum_sample: top-50 per language
    by splitmix64(doc_id) desc (bijective — no ties)."""
    return f"""
        {_splitmix_docs_cte()}
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY h DESC, doc_id DESC) AS rn
          FROM hv)
        WHERE rn <= 50
    """


def oracle_sql() -> dict[str, str]:
    return {
        "q1_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_customer_orders": """
            SELECT n_name,
                   count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-09-01'
              AND l_shipdate < TIMESTAMP '1995-10-01'
              AND l_discount > 0.05
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "window_events": """
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS bucket,
                   count(*) AS n,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type, bucket
        """,
        "sessionize_events": """
            SELECT user_id,
                   (1 + sum(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END))::BIGINT AS n_sessions
            FROM (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
                  FROM events)
            GROUP BY user_id
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT AS n_tokens
            FROM documents
        """,
        "asof_events_orders": """
            WITH o AS (
              SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
              FROM orders
              QUALIFY row_number() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
              ) = 1
            )
            SELECT e.event_id, e.ts, e.user_id,
                   o.o_orderdate, o.o_orderkey, o.o_totalprice
            FROM events e
            ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "range_orders_lineitem": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
                   l.l_shipdate, l.l_linenumber, l.l_extendedprice
            FROM orders o
            JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey
             AND l.l_shipdate BETWEEN o.o_orderdate
                                  AND o.o_orderdate + INTERVAL 60 DAY
        """,
        "sliding_window_events": """
            SELECT event_id, ts, user_id, value,
                   count(*) OVER w AS w_count,
                   sum(value) OVER w AS w_sum
            FROM events
            WINDOW w AS (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
            )
        """,
        "topk_orders_per_cust": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   row_number() OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey DESC
                   ) AS rank
            FROM orders
            QUALIFY rank <= 3
        """,
        "token_pieces_docs": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S'))::BIGINT AS n_pieces
            FROM documents
        """,
        "quality": """
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars_calc,
                   (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::BIGINT AS n_punct,
                   length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS n_upper,
                   (CASE WHEN trim(text) = '' THEN 1 ELSE 0 END)::BIGINT AS blank
            FROM documents
        """,
        "q5_local_supplier_volume": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n.n_name
        """,
        "q3_shipping": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
            LIMIT 10
        """,
        "quality_filter_docs": """
            WITH m AS (
              SELECT lang, quantile_disc(n_chars, 0.5) AS med
              FROM documents GROUP BY lang
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN m USING (lang)
            WHERE d.n_chars >= m.med
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 450000)
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "cluster_customers": """
            WITH RECURSIVE
            pts AS (
              SELECT c_custkey AS key,
                     (c_custkey * 9973 % 36000) // 300 AS gx,
                     (c_custkey * 9949 % 18000) // 300 AS gy
              FROM customer
            ),
            cells AS (
              SELECT DISTINCT gx, gy, (gx * 100000 + gy)::BIGINT AS id FROM pts
            ),
            edges AS (
              SELECT a.id AS a, b.id AS b
              FROM cells a JOIN cells b
              ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
                 AND a.id <> b.id
            ),
            reach(id, label) AS (
              SELECT id, id FROM cells
              UNION
              SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
            ),
            comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)
            SELECT p.key, c.cluster
            FROM pts p
            JOIN comp c ON (p.gx * 100000 + p.gy)::BIGINT = c.id
        """,
        "segment_join_customers": """
            WITH s AS (
              SELECT c_custkey AS key,
                     (c_custkey * 73 % 2001)::BIGINT AS x1,
                     (c_custkey * 149 % 2001)::BIGINT AS y1,
                     (c_custkey * 73 % 2001 + c_custkey * 37 % 401 - 200)::BIGINT AS x2,
                     (c_custkey * 149 % 2001 + c_custkey * 53 % 401 - 200)::BIGINT AS y2
              FROM customer
            ),
            cand AS (
              SELECT l.key AS l_key, r.key AS r_key,
                     (r.x2 - r.x1) * (l.y1 - r.y1) - (r.y2 - r.y1) * (l.x1 - r.x1) AS d1,
                     (r.x2 - r.x1) * (l.y2 - r.y1) - (r.y2 - r.y1) * (l.x2 - r.x1) AS d2,
                     (l.x2 - l.x1) * (r.y1 - l.y1) - (l.y2 - l.y1) * (r.x1 - l.x1) AS d3,
                     (l.x2 - l.x1) * (r.y2 - l.y1) - (l.y2 - l.y1) * (r.x2 - l.x1) AS d4,
                     l.x1 AS lx1, l.y1 AS ly1, l.x2 AS lx2, l.y2 AS ly2,
                     r.x1 AS rx1, r.y1 AS ry1, r.x2 AS rx2, r.y2 AS ry2
              FROM s l, s r
              WHERE l.key <= 250
            )
            SELECT l_key, r_key FROM cand
            WHERE (((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
                   AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)))
               OR (d1 = 0 AND lx1 BETWEEN least(rx1, rx2) AND greatest(rx1, rx2)
                          AND ly1 BETWEEN least(ry1, ry2) AND greatest(ry1, ry2))
               OR (d2 = 0 AND lx2 BETWEEN least(rx1, rx2) AND greatest(rx1, rx2)
                          AND ly2 BETWEEN least(ry1, ry2) AND greatest(ry1, ry2))
               OR (d3 = 0 AND rx1 BETWEEN least(lx1, lx2) AND greatest(lx1, lx2)
                          AND ry1 BETWEEN least(ly1, ly2) AND greatest(ly1, ly2))
               OR (d4 = 0 AND rx2 BETWEEN least(lx1, lx2) AND greatest(lx1, lx2)
                          AND ry2 BETWEEN least(ly1, ly2) AND greatest(ly1, ly2))
        """,
        "repetition_docs": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ),
            tok AS (
              SELECT doc_id, unnest(toks) AS w,
                     unnest(range(len(toks))) AS i
              FROM t
            ),
            d AS (
              SELECT doc_id, count(*)::BIGINT AS n_tokens,
                     count(DISTINCT w)::BIGINT AS n_distinct_tokens
              FROM tok GROUP BY doc_id
            ),
            bg AS (
              SELECT a.doc_id, a.w AS w1, b.w AS w2
              FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ),
            bgc AS (
              SELECT doc_id, w1, w2, count(*)::BIGINT AS c
              FROM bg GROUP BY doc_id, w1, w2
            ),
            bstat AS (
              SELECT doc_id, max(c)::BIGINT AS top_bigram_count,
                     sum(c)::BIGINT AS n_bigrams
              FROM bgc GROUP BY doc_id
            )
            SELECT d.doc_id, n_tokens, n_distinct_tokens,
                   coalesce(top_bigram_count, 0)::BIGINT AS top_bigram_count,
                   coalesce(n_bigrams, 0)::BIGINT AS n_bigrams
            FROM d LEFT JOIN bstat USING (doc_id)
        """,
        "span_dedup_docs": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ),
            s AS (
              SELECT doc_id,
                     unnest(range(CAST(ceil(len(toks) / 2.0) AS BIGINT))) AS ord,
                     toks
              FROM t
            ),
            paras AS (
              SELECT doc_id, ord,
                     array_to_string(
                       toks[(ord * 2 + 1):least(ord * 2 + 2, len(toks))], ' '
                     ) AS span
              FROM s
            ),
            kept AS (
              SELECT doc_id, ord, span,
                     row_number() OVER (
                       PARTITION BY span ORDER BY doc_id, ord
                     ) AS rn
              FROM paras
            )
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY ord) AS text,
                   count(*)::BIGINT AS n_kept
            FROM kept WHERE rn = 1
            GROUP BY doc_id
        """,
        "chunk_docs": """
            WITH n AS (SELECT doc_id, string_split(text, ' ') AS l,
                              len(string_split(text, ' ')) AS n FROM documents),
            c AS (SELECT doc_id, l, n,
                  CASE WHEN n <= 32 THEN 1 ELSE ((n - 32 + 23) // 24) + 1 END AS n_chunks
                  FROM n),
            e AS (SELECT doc_id, l, n, unnest(range(n_chunks)) AS i FROM c)
            SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                   CAST(LEAST(i*24 + 32, n) - i*24 AS INT) AS n_tok,
                   array_to_string(l[i*24 + 1 : LEAST(i*24 + 32, n)], ' ') AS chunk_text
            FROM e
        """,
        "decontam_docs": """
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l,
                                len(string_split(text, ' ')) AS nt FROM documents),
            g AS (SELECT doc_id, array_to_string(l[i+1 : i+8], ' ') AS gram
                  FROM tok, unnest(range(nt - 8 + 1)) t(i) WHERE nt >= 8),
            bl AS (SELECT DISTINCT gram FROM g WHERE doc_id % 101 = 0),
            hits AS (SELECT DISTINCT d.doc_id, d.gram FROM g d JOIN bl USING (gram))
            SELECT doc_id, count(*)::BIGINT AS n_hits FROM hits GROUP BY doc_id
        """,
        "distinct_custkeys_orders": """
            SELECT count(DISTINCT o_custkey)::BIGINT AS n_distinct FROM orders
        """,
        "shuffle_docs": f"""
            {_splitmix_docs_cte()}
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
            FROM hv
        """,
        "pivot_events": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
            FROM events GROUP BY user_id
        """,
        "heavy_custkeys_orders": """
            SELECT o_custkey AS v, count(*)::BIGINT AS n
            FROM orders GROUP BY o_custkey HAVING count(*) >= 16
        """,
        "lag_events": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS lag_us
            FROM events
        """,
        "quantiles_by_event_type": """
            SELECT event_type,
                   quantile_disc(value, 0.25) AS q25,
                   quantile_disc(value, 0.50) AS q50,
                   quantile_disc(value, 0.75) AS q75
            FROM events GROUP BY event_type
        """,
        "sample_weighted_docs": f"""
            {_splitmix_docs_cte()}
            SELECT d.doc_id, length(d.text)::BIGINT AS w
            FROM documents d JOIN hv ON hv.doc_id = d.doc_id
            WHERE CAST(hv.h AS DOUBLE) / 18446744073709551616.0
                  < 0.0025 * length(d.text)
        """,
        "semi_join_bloom_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "radius_customers": """
            WITH pts AS (
              SELECT c_custkey AS id,
                     (c_custkey * 9973 % 36000) / 100.0 - 180.0 AS px,
                     (c_custkey * 9949 % 18000) / 100.0 - 90.0 AS py
              FROM customer),
            q AS (SELECT * FROM pts WHERE id <= 20)
            SELECT q.id AS qid, p.id AS id,
                   (q.px - p.px) * (q.px - p.px) + (q.py - p.py) * (q.py - p.py) AS d2
            FROM q, pts p
            WHERE (q.px - p.px) * (q.px - p.px) + (q.py - p.py) * (q.py - p.py) <= 144.0
        """,
        "bbox_join_customers": """
            WITH c AS (
              SELECT c_custkey AS key,
                     (c_custkey * 9973 % 36000) / 100.0 - 180.0 AS cx,
                     (c_custkey * 9949 % 18000) / 100.0 - 90.0 AS cy,
                     (c_custkey * 31 % 97) / 10.0 + 0.05 AS hw,
                     (c_custkey * 57 % 89) / 10.0 + 0.05 AS hh
              FROM customer),
            b AS (SELECT key, cx - hw AS minx, cy - hh AS miny,
                         cx + hw AS maxx, cy + hh AS maxy FROM c)
            SELECT l.key AS l_key, r.key AS r_key
            FROM b l, b r
            WHERE l.key <= 200
              AND l.minx <= r.maxx AND r.minx <= l.maxx
              AND l.miny <= r.maxy AND r.miny <= l.maxy
        """,
        "normalize_docs": r"""
            SELECT doc_id,
                   lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) AS norm_text
            FROM documents
        """,
        "top_terms_docs": r"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ), words AS (SELECT doc_id, lower(w) AS term FROM toks),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM words GROUP BY 1),
            n AS (SELECT count(*)::BIGINT AS n FROM documents)
            SELECT doc_id, term, tf, df, rank FROM (
              SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf * (n.n - df.df) DESC, tf.term ASC) AS rank
              FROM tf JOIN df USING (term) CROSS JOIN n)
            WHERE rank <= 3
        """,
        "sample_stratified_docs": _sample_stratified_oracle_sql(),
        "sample_per_lang_docs": _sample_per_lang_oracle_sql(),
        "quantiles_orders": """
            SELECT quantile_disc(o_totalprice, 0.5) AS p50,
                   quantile_disc(o_totalprice, 0.9) AS p90,
                   quantile_disc(o_totalprice, 0.99) AS p99
            FROM orders
        """,
        "pack_sequences_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens
              FROM documents),
            s AS (
              SELECT doc_id, n_tokens,
                     COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_tok
              FROM t)
            SELECT doc_id, n_tokens, start_tok,
                   (start_tok // 2048)::BIGINT AS seq_id,
                   (start_tok % 2048)::BIGINT AS offset_in_seq
            FROM s
        """,
        "ngram_jaccard": """
            WITH t AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(trim(text), '\\s+')) AS words
              FROM documents WHERE trim(text) <> ''
            )
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.words, b.words))::DOUBLE
                  / len(list_distinct(list_concat(a.words, b.words))) >= 0.8
        """,
        "embedding_near_dup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
                 q AS (SELECT * FROM e WHERE vec_id < 4),
                 s AS (SELECT q.vec_id AS qid, e.vec_id AS vid,
                              list_cosine_similarity(q.emb, e.emb) AS cos
                       FROM q CROSS JOIN e)
            SELECT qid, vid AS vec_id, rank FROM (
              SELECT qid, vid,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) - 1 AS rank
              FROM s)
            WHERE rank < 5
        """,
        "grid_cell_customers": """
            SELECT ((c_custkey * 9949 % 18000) // 2250) * 8
                   + ((c_custkey * 9973 % 36000) // 4500) AS cell,
                   count(*) AS n
            FROM customer GROUP BY cell
        """,
        "hex_cell_customers": _hex_cell_oracle_sql(),
        "lang_id_docs": _lang_id_oracle_sql(),
        "simhash_docs": _simhash_oracle_sql(),
        "simhash_pairs_docs": f"""
            WITH s AS ({_simhash_oracle_sql()})
            SELECT a.doc_id AS a, b.doc_id AS b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "jaccard_dedup_docs": r"""
            WITH RECURSIVE
            t AS (SELECT doc_id,
                         list_distinct(string_split_regex(trim(text), '\s+')) AS words
                  FROM documents WHERE trim(text) <> ''),
            near AS (SELECT a.doc_id AS a, b.doc_id AS b
                     FROM t a JOIN t b ON a.doc_id < b.doc_id
                     WHERE len(list_intersect(a.words, b.words))::DOUBLE
                           / len(list_distinct(list_concat(a.words, b.words))) >= 0.8),
            exact AS (SELECT a.doc_id AS a, b.doc_id AS b
                      FROM documents a JOIN documents b
                      ON coalesce(a.text,'') = coalesce(b.text,'')
                         AND a.doc_id < b.doc_id),
            edges AS (SELECT * FROM near UNION SELECT * FROM exact),
            sym AS (SELECT a AS u, b AS v FROM edges
                    UNION SELECT b AS u, a AS v FROM edges),
            reach(node, r) AS (
                SELECT u, v FROM sym
                UNION
                SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
            )
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(min(r.r), d.doc_id))::BIGINT AS keep_id
            FROM documents d LEFT JOIN reach r ON r.node = d.doc_id
            GROUP BY d.doc_id
        """,
        "fingerprint_docs": _fingerprint_oracle_sql(),
        "minhash_pairs_docs": _minhash_pairs_oracle_sql(),
        "minhash_dedup_docs": _minhash_dedup_oracle_sql(),
        "knn_customers": """
            WITH pts AS (
              SELECT c_custkey AS id,
                     (c_custkey * 9973 % 36000) / 100.0 - 180.0 AS px,
                     (c_custkey * 9949 % 18000) / 100.0 - 90.0 AS py
              FROM customer),
            q AS (SELECT * FROM pts WHERE id >= 1 AND id <= 20),
            d AS (
              SELECT q.id AS qid, p.id AS neighbor_id,
                     (q.px - p.px) * (q.px - p.px) + (q.py - p.py) * (q.py - p.py) AS d2
              FROM q, pts p WHERE p.id <> q.id)
            SELECT qid, neighbor_id, rank FROM (
              SELECT qid, neighbor_id,
                     row_number() OVER (PARTITION BY qid ORDER BY d2, neighbor_id) AS rank
              FROM d)
            WHERE rank <= 5
        """,
        "pip_customers": """
            SELECT c_custkey FROM (
              SELECT c_custkey,
                     (c_custkey * 9973 % 36000) / 100.0 - 180.0 AS px,
                     (c_custkey * 9949 % 18000) / 100.0 - 90.0 AS py
              FROM customer)
            WHERE px > -90.055 AND px < 60.155 AND py > -45.055 AND py < 30.255
        """,
    }
