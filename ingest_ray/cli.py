"""CLI — the reference's scan/ingest/optimize surface
(/root/reference/src/bin.rs:51-237) as ``python -m ingest_ray.cli``.

Subcommands:

* ``ingest   --input DOCS --output DIR [--no-node/--no-way/--no-relation]``
  documents → features parquet (the reference's `ingest` without the
  optimize pass; scan is obsolete — fragment metadata replaces it).
* ``optimize --input DOCS --output DIR [--grid X,Y] [--leaf N] [--no-resume]``
  full pipeline → quad-tiled checkpointed tile store (the reference's
  `ingest --optimize=X,Y` / standalone `optimize`).
* ``stats    --output DIR`` print the manifest roll-up of a tile store.

This entry point owns its Ray session (the only place besides bench.py
and the test fixture that may call ray.init; the driver-facing
``__ray_entry__`` must not). Designed for ``ray job submit -- python -m
ingest_ray.cli ...`` on a real cluster; local mode here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
        )
    return ray


def cmd_ingest(args) -> int:
    from .config import EngineConfig
    from .io import read_documents, write_features
    from .pipeline import ingest_features

    cfg = EngineConfig(
        join_mode=args.join_mode,
        ingest_node=not args.no_node,
        ingest_way=not args.no_way,
        ingest_relation=not args.no_relation,
    )
    docs = read_documents(args.input)
    feats = ingest_features(docs, cfg)
    if args.cells:
        from .cells import add_cell_columns

        feats = feats.map_batches(add_cell_columns, batch_format="pyarrow", zero_copy_batch=True)
    write_features(feats, args.output)
    print(json.dumps({"output": args.output, "status": "ok"}))
    return 0


def cmd_optimize(args) -> int:
    from .checkpoint import optimize_to_tiles
    from .config import EngineConfig
    from .io import read_documents
    from .pipeline import ingest_features

    gx, gy = (int(v) for v in args.grid.split(","))
    docs = read_documents(args.input)
    if getattr(args, "staged", False):
        from .checkpoint import staged_ingest

        feats = staged_ingest(
            docs, args.output, EngineConfig(join_mode=args.join_mode), resume=not args.no_resume
        )
    else:
        feats = ingest_features(docs, EngineConfig(join_mode=args.join_mode))
    if getattr(args, "progress", False):
        from .progress import ProgressTracker

        prog = ProgressTracker()
        feats = feats.map_batches(
            prog.wrap(lambda b: b, "features"), batch_format="pyarrow", zero_copy_batch=True
        )
        with prog.observe(interval_s=1.0):
            manifest = optimize_to_tiles(
                feats,
                args.output,
                grid_divs=(gx, gy),
                leaf_capacity=args.leaf,
                resume=not args.no_resume,
                divide=getattr(args, "divide", "exact"),
            )
            df = manifest.to_pandas()
    else:
        manifest = optimize_to_tiles(
            feats,
            args.output,
            grid_divs=(gx, gy),
            leaf_capacity=args.leaf,
            resume=not args.no_resume,
            divide=getattr(args, "divide", "exact"),
        )
        df = manifest.to_pandas()
    print(
        json.dumps(
            {
                "output": args.output,
                "tiles": int(len(df)),
                "rows": int(df["rows"].sum()) if len(df) else 0,
                "status": "ok",
            }
        )
    )
    return 0


def cmd_stats(args) -> int:
    mdir = os.path.join(args.output, "manifest")
    if not os.path.isdir(mdir):
        # same JSON-line error contract as the other subcommands —
        # not a bare traceback (e.g. stats before optimize, typoed path)
        print(json.dumps({"error": f"no manifest directory at {mdir}"}))
        return 1
    tiles = rows = cells = 0
    wall = 0.0
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("status") != "committed":
            continue
        cells += 1
        tiles += len(m["tiles"])
        rows += m["rows"]
        wall += m.get("wall_s", 0.0)
    print(json.dumps({"cells": cells, "tiles": tiles, "rows": rows, "cell_wall_s": round(wall, 3)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ingest_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest", help="documents -> features parquet")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--join-mode", default="auto", choices=["auto", "broadcast", "shuffle"])
    p.add_argument("--no-node", action="store_true")
    p.add_argument("--no-way", action="store_true")
    p.add_argument("--no-relation", action="store_true")
    p.add_argument("--cells", action="store_true", help="add hex/s2 cell columns")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("optimize", help="documents -> quad-tiled checkpointed store")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--join-mode", default="auto", choices=["auto", "broadcast", "shuffle"])
    p.add_argument("--grid", default="8,8", help="X,Y grid divisions")
    p.add_argument("--leaf", type=int, default=50_000, help="tile leaf capacity")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--divide",
        default="exact",
        choices=["exact", "aggregated"],
        help="exact: per-cell divide in one task; aggregated: skew-defused "
        "path-histogram divide + per-tile write (byte-identical store)",
    )
    p.add_argument("--progress", action="store_true", help="print 1 Hz per-stage progress lines (A3 observer)")
    p.add_argument(
        "--staged",
        action="store_true",
        help="checkpoint the elements and features stages to parquet so a killed run resumes without reparsing/re-encoding",
    )
    p.set_defaults(fn=cmd_optimize)

    p = sub.add_parser("stats", help="manifest roll-up of a tile store")
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    if args.cmd != "stats":
        _init_ray()
    try:
        return args.fn(args)
    finally:
        if args.cmd != "stats":
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
