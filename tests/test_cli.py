"""CLI surface (ingest / optimize / stats) — §2.9 parity."""

import json
import os

import pytest
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


@pytest.mark.usefixtures("ray_session")
def test_staged_ingest_resume(tmp_path):
    """A killed encode run resumes from the committed elements stage —
    the documents are never re-read (docs_ds=None proves it) — and a
    fully committed run reuses the features stage byte-for-byte."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from ingest_ray.checkpoint import staged_ingest
    from ingest_ray.config import EngineConfig
    from ingest_ray.synth import synth_documents

    out = str(tmp_path / "store")
    docs = rd.from_arrow(synth_documents(4000))
    cfg = EngineConfig(join_mode="broadcast")

    def collect(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
        # doc_id is dictionary-encoded in flight; decay for sort_by
        # (Arrow can't sort dictionary columns) and for a dictionary-
        # order-independent equality
        i = t.schema.get_field_index("doc_id")
        t = t.set_column(i, "doc_id", t.column("doc_id").cast(pa.string()))
        return t.sort_by([("key", "ascending"), ("doc_id", "ascending"), ("span_idx", "ascending")])

    first = collect(staged_ingest(docs, out, cfg))

    # crash between elements and features: features stage gone, elements
    # committed → resume must succeed WITHOUT documents
    shutil.rmtree(os.path.join(out, "_stage", "features"))
    os.remove(os.path.join(out, "_stage", "features._committed.json"))
    resumed = collect(staged_ingest(None, out, cfg))
    assert resumed.equals(first)

    # fully committed → returns features without touching documents
    again = collect(staged_ingest(None, out, cfg))
    assert again.equals(first)


def test_jsonl_documents_source_feature_parity(ray_session, tmp_path):
    """A JSONL corpus must flow through the flagship pipeline with
    byte-identical features to the Arrow/Parquet path (format-agnostic
    span schema)."""
    import pandas as pd
    import ray.data as rd

    from ingest_ray.config import EngineConfig
    from ingest_ray.io import read_documents_jsonl, write_documents_jsonl
    from ingest_ray.pipeline import ingest_features
    from ingest_ray.synth import synth_documents

    t = synth_documents(600)
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(rd.from_arrow(t).repartition(3), out)
    back = read_documents_jsonl(out)
    cfg = EngineConfig(join_mode="broadcast")
    a = (
        ingest_features(rd.from_arrow(t), cfg)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    b = (
        ingest_features(back, cfg)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
