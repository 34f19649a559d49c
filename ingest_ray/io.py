"""Input/output facade — documents in, partitioned tiles out.

The BASELINE.json contract names Lance tables as the input corpus
format. This sandbox has no ``pylance``; the facade reads Lance when
the library is importable and falls back to Parquet with the identical
schema otherwise (SURVEY.md §7.0). The rest of the engine only ever
sees a ``ray.data.Dataset`` of the documents schema, so the swap is
invisible downstream.

Reference parity: replaces the PBF blob scanner + stdin source
(/root/reference/src/par_scan.rs:12-28, src/bin.rs:291) — fragment
planning and column pruning come free from the datasource.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - pylance not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, columns: list[str] | None = None, **kwargs):
    """path (``.lance`` dataset dir or ``.parquet`` file/dir) →
    documents Dataset. Columns are pruned at the read (never load span
    payloads a stage does not need)."""
    import ray.data as rd

    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


DOCUMENTS_SCHEMA_HINT = None  # built lazily (pyarrow import cost)


def _documents_schema():
    global DOCUMENTS_SCHEMA_HINT
    if DOCUMENTS_SCHEMA_HINT is None:
        import pyarrow as pa

        DOCUMENTS_SCHEMA_HINT = pa.schema(
            [
                pa.field("doc_id", pa.string()),
                pa.field(
                    "spans",
                    pa.list_(
                        pa.struct(
                            [
                                pa.field("kind", pa.string()),
                                pa.field("text", pa.string()),
                                pa.field("media_ref", pa.string()),
                                pa.field("offset", pa.int32()),
                            ]
                        )
                    ),
                ),
            ]
        )
    return DOCUMENTS_SCHEMA_HINT


def read_documents_jsonl(path: str, **kwargs):
    """JSONL documents (one ``{"doc_id": ..., "spans": [...]}`` object
    per line) → documents Dataset with the canonical span schema.
    Arrow's JSON reader parses the nested list<struct> natively and
    per-file tasks parallelize across the corpus; an explicit
    ``explicit_schema`` pin keeps span field order and offset width
    identical to the Parquet/Lance path, so every downstream stage
    (span explode, element parse) is format-agnostic."""
    import ray.data as rd
    from pyarrow import json as pajson

    return rd.read_json(
        path,
        file_extensions=["jsonl", "json"],
        parse_options=pajson.ParseOptions(
            explicit_schema=_documents_schema(), unexpected_field_behavior="ignore"
        ),
        **kwargs,
    )


def write_documents_jsonl(docs_ds, out_path: str, **kwargs):
    """documents Dataset → JSONL directory (one file per block)."""
    os.makedirs(out_path, exist_ok=True)
    docs_ds.write_json(out_path, **kwargs)
    return out_path


def write_features(features_ds, out_path: str, partition_cols: list[str] | None = None, **kwargs):
    """Write a features Dataset as partitioned Parquet (one file per
    block; resumable layout — never one giant file)."""
    os.makedirs(out_path, exist_ok=True)
    features_ds.write_parquet(out_path, partition_cols=partition_cols, **kwargs)
    return out_path
