"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

Modes
-----
default         run the headline suite once under
                ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)
--scaling       run the flagship ingest+tile pipeline twice in FRESH
                subprocesses (num_cpus=8 then num_cpus=32) on identical
                input and report throughput at both + scaling
                efficiency (thr_32/thr_8)/4 — the two-cluster-size
                evidence required by BASELINE.json north_rule (a real
                multi-node cluster is unavailable in this sandbox).
--worker N      internal: one fresh-session flagship run at N cpus.

The flagship corpus is synthesized deterministically once per scale
(cached parquet under /tmp) so both scaling runs read identical bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Ray 2.49's sort-based shuffle emits zero-column blocks for empty
# partitions, so EVERY schema-pinned groupby().map_groups() logs
# "RefBundle with a different schema ... new schema: ." (reproducible
# with a 3-group/8-partition minimal example — no user code involved).
# The user-fixable class (pandas dtype drift on empty groups) is fixed
# by casting every group output to a pa.schema; drop the remaining
# Ray-internal artifact so real warnings stay visible in the tail.
# A logger FILTER (not setLevel) because ray.data's dictConfig resets
# child-logger levels — but not filters — at first dataset execution.
import logging as _logging


class _DropSchemaNoise(_logging.Filter):
    """Drop ONLY the zero-column-block artifact (message ends with the
    empty schema rendering "new schema: ."); genuine schema-drift
    warnings, whose new schema is non-empty, still surface."""

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "different schema" in msg and msg.rstrip().endswith("new schema: .")
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_DropSchemaNoise())

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_ELEMENTS_PER_SF = 30_000_000  # sf0.1 -> 3M elements (~420k feature rows)


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(sf: float) -> str:
    """Deterministic synthetic corpus, cached per scale — a directory
    of part files so the read plans one task per file."""
    n = max(2_000, int(BENCH_ELEMENTS_PER_SF * sf))
    path = f"/tmp/ingest_ray_bench/corpus_v3_n{n}"
    if not os.path.isdir(path):
        from ingest_ray.synth import write_corpus

        write_corpus(path, n, num_files=64)
    return path


def flagship(sf_dir: str, out_dir: str, corpus: str | None = None, join_mode: str = "auto") -> dict:
    """The headline pipeline: documents → parse → joins → encode →
    cell index → quadtile divide → checkpointed partitioned sink."""
    import ray.data as rd

    from ingest_ray.cells import add_cell_columns
    from ingest_ray.checkpoint import optimize_to_tiles
    from ingest_ray.config import EngineConfig
    from ingest_ray.pipeline import ingest_features

    if corpus is None:
        corpus = corpus_path(_sf_of(sf_dir))

    t0 = time.perf_counter()
    # right-size the read: the default plan yields ~5 MB blocks whose
    # fragmentation propagates through parse → encode → union and
    # forces the pre-shuffle coalesce to do real work (measured 25-30%
    # whole-flagship win at 4×CPUs blocks vs the default)
    from ingest_ray.util import cluster_cpus

    docs = rd.read_parquet(corpus, override_num_blocks=max(4 * cluster_cpus(), 64))
    # auto join mode picks the zone-map broadcast path below 250M build
    # rows and the distributed hash join beyond; --scaling measures BOTH
    # modes explicitly (see run_scaling).
    # GRAFT_MATERIALIZE_ELEMENTS: "1" (default) materializes the union
    # element table; "index" runs the two-pass streaming mode (pruned
    # index projection only — see pipeline._ingest_features_index_mode);
    # "0" runs per-kind streaming parses. A/B knobs for the memory-bound
    # 32-CPU regime.
    _mat_env = os.environ.get("GRAFT_MATERIALIZE_ELEMENTS", "1")
    mat = "index" if _mat_env == "index" else _mat_env != "0"
    feats = ingest_features(
        docs,
        EngineConfig(
            join_mode=join_mode,
            num_partitions=32,
            materialize_elements=mat,
        ),
    )
    # H3/S2 cell columns are computed INSIDE the tile writers (augment=),
    # not upstream: they are 56 B/row — ~31% of the tile exchange — and
    # pure functions of the feature bbox, so post-shuffle computation
    # cuts the all-to-all a third with byte-identical output files
    manifest = optimize_to_tiles(
        feats,
        out_dir,
        grid_divs=(8, 8),
        leaf_capacity=2048,
        resume=False,
        augment=add_cell_columns,
    )
    import pyarrow as pa  # noqa: F401

    rows = manifest.to_pandas()
    n_features = int(rows["rows"].sum())
    n_tiles = int(len(rows))
    elapsed = time.perf_counter() - t0
    return {
        "elapsed_s": elapsed,
        "features": n_features,
        "tiles": n_tiles,
        "features_per_s": n_features / elapsed,
        "tiles_per_s": n_tiles / elapsed,
    }


def run_worker(num_cpus: int, sf_dir: str, corpus: str | None = None, join_mode: str = "auto") -> None:
    import shutil

    import ray

    out_dir = f"/tmp/ingest_ray_bench/out_cpus{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    if corpus is None:
        corpus = corpus_path(_sf_of(sf_dir))  # synthesize outside the timed region
    load0 = os.getloadavg()[0]  # co-tenant evidence: loads ship with the result
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        # warm the worker pool so the timed run measures steady-state
        # throughput, not process spawn latency
        import ray.data as rd

        rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).materialize()
        res = flagship(sf_dir, out_dir, corpus=corpus, join_mode=join_mode)
    finally:
        ray.shutdown()
    res["num_cpus"] = num_cpus
    # 1-min load at leg start/end: this box is co-tenant-shared, and a
    # burst during a leg is the main source of ratio noise — recording
    # both makes a contaminated observation visible in the data itself
    res["load_1m_start"] = round(load0, 2)
    res["load_1m_end"] = round(os.getloadavg()[0], 2)
    print("WORKER_RESULT " + json.dumps(res))


def run_control_worker(num_cpus: int, corpus: str) -> None:
    """Compute-bound control leg: 64-hash MinHash sketching of every
    document in the corpus (shingle FNV + 64 splitmix passes per doc —
    a REAL dedup stage, ~10-30x more arithmetic per byte read than the
    flagship parse). If CPU-count scaling of THIS pipeline is high
    while the flagship's is low, the flagship's limiter is the box's
    memory system, not engine serialization."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    load0 = os.getloadavg()[0]
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        import ray.data as rd

        from ingest_ray.functions.dedup import (
            band_hash_matrix,
            minhash_matrix,
            shingle_hashes_batch,
        )
        from ingest_ray.util import cluster_cpus

        rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).materialize()

        def sketch(batch: pa.Table) -> pa.Table:
            spans = batch.column("spans")
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            # doc text = its span texts joined (list<struct> -> list<string>)
            texts_list = pa.ListArray.from_arrays(
                spans.offsets, spans.values.field("text")
            )
            texts = pc.binary_join(texts_list, " ").to_pylist()
            flat, offs = shingle_hashes_batch(texts, n=3)
            sig = minhash_matrix(flat, offs, num_hashes=64)
            bh = band_hash_matrix(sig, 16)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "b0": pa.array(bh[:, 0].view(np.int64), pa.int64()),
                }
            )

        docs = rd.read_parquet(
            corpus, override_num_blocks=max(4 * cluster_cpus(), 64)
        )
        t0 = time.perf_counter()
        n_docs = docs.map_batches(
            sketch, batch_format="pyarrow", zero_copy_batch=True
        ).count()
        elapsed = time.perf_counter() - t0
    finally:
        ray.shutdown()
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "docs": n_docs,
                "docs_per_s": round(n_docs / elapsed, 1),
                "elapsed_s": round(elapsed, 2),
                "num_cpus": num_cpus,
                "load_1m_start": round(load0, 2),
                "load_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )


def run_scaling_control() -> None:
    """Fresh-process compute-bound control legs at SCALING_CPUS —
    the engine-vs-box discriminator companion to --scaling."""
    n = int(os.environ.get("GRAFT_CONTROL_ELEMENTS", "12000000"))
    corpus = f"/tmp/ingest_ray_bench/corpus_v3_n{n}"
    if not os.path.isdir(corpus):
        from ingest_ray.synth import write_corpus

        write_corpus(corpus, n, num_files=64)
    lo, hi = SCALING_CPUS
    runs = {}
    for cpus in (lo, hi):
        probe = _fault_probe_s()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--control-worker",
                str(cpus),
                "--corpus",
                corpus,
            ],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("WORKER_RESULT ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
            raise RuntimeError(f"control worker at {cpus} cpus failed")
        r = json.loads(line[-1][len("WORKER_RESULT "):])
        r["fault_probe_s"] = round(probe, 3)
        runs[str(cpus)] = r
    eff = round(
        (runs[str(hi)]["docs_per_s"] / runs[str(lo)]["docs_per_s"]) / (hi / lo), 4
    )
    print(
        json.dumps(
            {
                "metric": "control_scaling_minhash",
                "value": eff,
                "unit": "efficiency",
                "runs": runs,
                "scaling_cpus": [lo, hi],
                "match": runs[str(lo)]["docs"] == runs[str(hi)]["docs"],
            }
        )
    )


# 120M elements: the smallest corpus where parallel work dominates the
# measured ~18 s fixed floor enough for the CPU-count stand-in to reflect
# cluster-size scaling (P/S fit in BASELINE.md; 30M measures the floor,
# not the engine — a 10^12-doc deployment runs millions of elements per
# core, and 120M/32 CPUs is still conservative vs that regime)
SCALING_ELEMENTS = int(os.environ.get("GRAFT_SCALING_ELEMENTS", "120000000"))
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
# max seconds to wait (per leg) for the host to pass the page-fault
# probe before running the leg anyway; 0 disables the gate
SCALING_QUIET_WAIT = int(os.environ.get("GRAFT_SCALING_QUIET_WAIT", "600"))
# the two parallelism levels standing in for the N / 4N cluster sizes;
# "4,16" measures the less memory-bound pairing on this shared box
SCALING_CPUS = tuple(
    int(c) for c in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
)


def _fault_probe_s() -> float:
    """First-touch page-fault probe (seconds to fault in 400MB).

    This host intermittently enters memory-ballooning phases where any
    fresh allocation stalls ~100x (multi-second first touches, load
    average full of D-state tasks with ZERO cpu ticks). A leg started
    in such a phase measures the hypervisor, not the engine — so legs
    wait for a sub-0.6 s probe (bounded by SCALING_QUIET_WAIT) and the
    observed probe value ships with each leg's results."""
    import numpy as np

    t = time.perf_counter()
    a = np.empty(400_000_000, dtype=np.uint8)
    a[::4096] = 1
    del a
    return time.perf_counter() - t


def run_scaling(sf_dir: str) -> None:
    """Fresh-process runs at 8 vs 32 cpus on identical input.

    Uses a larger corpus than the per-query suite (default 30M
    elements) so parallel work dominates fixed startup/barrier costs —
    the regime the 10^12-doc target actually runs in — and takes the
    best of ``SCALING_REPEATS`` runs per leg (single-run wall time on
    this shared machine varies ±25%, with intermittent multi-second
    first-touch page-fault stalls from host memory ballooning). BOTH
    execution modes are measured: ``auto`` (the flagship zone-map
    sharded-index path — the reference's ScanTable design, a pull-based
    exchange through the object store with per-node caching on a real
    cluster) and ``shuffle`` (explicit Dataset.join exchanges). On a
    single box the shuffle legs are memory-bandwidth-bound, so CPU-count
    scaling UNDERSTATES multi-node scaling for that mode (each added
    node brings its own memory bandwidth; added local CPUs do not)."""
    n = SCALING_ELEMENTS
    corpus = f"/tmp/ingest_ray_bench/corpus_v3_n{n}"
    if not os.path.isdir(corpus):
        from ingest_ray.synth import write_corpus

        write_corpus(corpus, n, num_files=64)

    def leg(cpus: int, mode: str) -> dict:
        best = None
        for _ in range(max(1, SCALING_REPEATS)):
            probe = _fault_probe_s()
            deadline = time.monotonic() + SCALING_QUIET_WAIT
            while probe >= 0.6 and time.monotonic() < deadline:
                sys.stderr.write(
                    f"[scaling] host unhealthy (first-touch {probe:.2f}s) — waiting\n"
                )
                time.sleep(60)
                probe = _fault_probe_s()
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    str(cpus),
                    "--sf-dir",
                    sf_dir,
                    "--corpus",
                    corpus,
                    "--join-mode",
                    mode,
                ],
                capture_output=True,
                text=True,
                timeout=3600,
                cwd=REPO,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("WORKER_RESULT ")]
            if not line:
                sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
                raise RuntimeError(f"worker at {cpus} cpus ({mode}) failed")
            r = json.loads(line[-1][len("WORKER_RESULT "):])
            r["fault_probe_s"] = round(probe, 3)
            if best is None or r["elapsed_s"] < best["elapsed_s"]:
                best = r
        return best

    results = {}
    effs = {}
    lo, hi = SCALING_CPUS
    for mode in ("auto", "shuffle"):
        runs = {c: leg(c, mode) for c in (lo, hi)}
        effs[mode] = round(
            (runs[hi]["features_per_s"] / runs[lo]["features_per_s"]) / (hi / lo), 4
        )
        results[mode] = {
            str(c): {
                "features_per_s": round(r["features_per_s"], 1),
                "tiles_per_s": round(r["tiles_per_s"], 2),
                "elapsed_s": round(r["elapsed_s"], 2),
                "features": r["features"],
                "tiles": r["tiles"],
                "load_1m_start": r.get("load_1m_start"),
                "load_1m_end": r.get("load_1m_end"),
                "fault_probe_s": r.get("fault_probe_s"),
            }
            for c, r in runs.items()
        }
        results[mode]["match"] = runs[lo]["features"] == runs[hi]["features"]

    out = {
        "metric": "ingest_scaling",
        # headline value: the flagship (auto zone-map) path users run;
        # the explicit-exchange path is reported alongside
        "value": effs["auto"],
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "runs": results,
        "scaling_cpus": [lo, hi],
        "scaling_efficiency": effs,
        "match": all(m["match"] for m in results.values()),
    }
    print(json.dumps(out))


# --------------------------------------------------------------------------
# headline suite (default mode)
# --------------------------------------------------------------------------


def suite(sf_dir: str) -> dict[str, float]:
    """Headline pipelines, timed individually. Each consumes its
    Dataset fully (count/write) — no lazy no-ops."""
    import __ray_entry__ as E

    def consume(res):
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, (pd.DataFrame, pa.Table)):
            return len(res)
        return res.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    out_dir = "/tmp/ingest_ray_bench/suite_out"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # synthesize the flagship corpus OUTSIDE the timed region (cold /tmp
    # otherwise charges ~60 s of one-time parquet generation to the
    # first query)
    corpus = corpus_path(_sf_of(sf_dir))
    timed("ingest_tiles", lambda: flagship(sf_dir, out_dir, corpus=corpus))

    for name in (
        "q1_lineitem",
        "join_customer_orders",
        "filter_project",
        "topk_orders",
        "window_events",
        "sessionize_events",
        "dedup_exact",
        "token_count",
        "minhash_pairs_docs",
        "minhash_dedup_docs",
        "simhash_pairs_docs",
        "ann_topk",
        "lsh_ann",
        "embedding_near_dup",
        "cells_synth",
        "knn_geo_synth",
        "pip_geo_synth",
        "raster_vector_synth",
        "raster_vector_part",
        "pip_geo_part",
        "knn_geo_part",
        "ivf_ann",
        "kmeans_embeddings",
        "quality_filter_docs",
        "kcenter_embeddings",
        "q3_shipping",
        "q5_local_supplier_volume",
        "asof_events_orders",
        "range_orders_lineitem",
        "sliding_window_events",
        "topk_orders_per_cust",
        "anti_join_customers",
        "semi_join_bloom_customers",
        "top_terms_docs",
        "sample_stratified_docs",
        "pack_sequences_docs",
        "quantiles_orders",
        "radius_customers",
        "bbox_join_customers",
        "segment_join_customers",
        "cluster_customers",
        "chunk_docs",
        "span_dedup_docs",
        "repetition_docs",
        "decontam_docs",
        "distinct_custkeys_orders",
        "shuffle_docs",
    ):
        q = E.queries()[name]
        timed(name, lambda q=q: consume(q(sf_dir)))

    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-control", action="store_true")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--control-worker", type=int, default=None)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--join-mode", default="auto", choices=["auto", "broadcast", "shuffle"])
    args = ap.parse_args()

    if args.worker is not None:
        run_worker(args.worker, args.sf_dir, corpus=args.corpus, join_mode=args.join_mode)
        return
    if args.control_worker is not None:
        run_control_worker(args.control_worker, args.corpus)
        return
    if args.scaling:
        run_scaling(args.sf_dir)
        return
    if args.scaling_control:
        run_scaling_control()
        return

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        timings = suite(args.sf_dir)
    finally:
        ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(args.sf_dir),
                "num_cpus": num_cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
