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


def write_features(features_ds, out_path: str, partition_cols: list[str] | None = None, **kwargs):
    """Write a features Dataset as partitioned Parquet (one file per
    block; resumable layout — never one giant file)."""
    os.makedirs(out_path, exist_ok=True)
    features_ds.write_parquet(out_path, partition_cols=partition_cols, **kwargs)
    return out_path
