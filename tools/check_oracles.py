"""Driver-simulation: run every __ray_entry__ query at a given sf and
compare SQL-oracled ones against DuckDB (row count + schema + order-
insensitive value comparison), rows-only ones for non-emptiness.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} != {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} != {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            # rtol guards large-magnitude float aggregates (e.g. ~1e8
            # revenue sums) against distributed summation-order noise
            if not np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                bad = np.flatnonzero(~np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9))
                return f"col {c}: {len(bad)} mismatches, first {bad[:3]} {av[bad[:3]]} vs {bv[bad[:3]]}"
        elif not (av == bv).all():
            bad = np.flatnonzero(av != bv)
            return f"col {c}: {len(bad)} mismatches, first {bad[:3]} {av[bad[:3]]} vs {bv[bad[:3]]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name in oracles:
            exp = con.execute(oracles[name]).df()
            err = compare(got, exp)
            if err:
                failures.append(name)
                print(f"FAIL  {name} ({dt:.1f}s rows={len(got)}): {err}")
            else:
                print(f"OK    {name} ({dt:.1f}s rows={len(got)}) oracle-matched")
        else:
            print(f"OK*   {name} ({dt:.1f}s rows={len(got)}) rows-only")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries passed")


if __name__ == "__main__":
    main()
