"""CLI surface (ingest / optimize / stats) — §2.9 parity."""

import json
import os
from argparse import Namespace

import pyarrow.parquet as pq

from ingest_ray import cli
from ingest_ray.synth import write_corpus


def _corpus(tmp_path) -> str:
    return write_corpus(str(tmp_path / "docs.parquet"), 600)


def test_cli_ingest(ray_session, tmp_path, capsys):
    out = str(tmp_path / "features")
    rc = cli.cmd_ingest(
        Namespace(
            input=_corpus(tmp_path),
            output=out,
            join_mode="broadcast",
            no_node=False,
            no_way=False,
            no_relation=False,
            cells=True,
        )
    )
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    t = pq.read_table(os.path.join(out, files[0]))
    assert {"key", "ftype", "kind", "payload", "hex_r9", "s2"} <= set(t.column_names)


def test_cli_optimize_and_stats(ray_session, tmp_path, capsys):
    out = str(tmp_path / "tiles")
    rc = cli.cmd_optimize(
        Namespace(
            input=_corpus(tmp_path),
            output=out,
            join_mode="broadcast",
            grid="4,4",
            leaf=100,
            no_resume=False,
        )
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "ok" and res["rows"] > 0

    rc = cli.cmd_stats(Namespace(output=out))
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == res["rows"]
    assert stats["tiles"] == res["tiles"]
