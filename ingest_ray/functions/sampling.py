"""Deterministic sampling over a keyed table.

Training-data pipelines downsample by stratum (language, source,
quality band) with REPRODUCIBLE membership: re-running the pipeline —
or re-running just one failed partition — must select the same rows.
Random-state sampling can't give that on a streaming engine (block
order isn't stable), so membership here is a pure function of the row
key: ``splitmix64(key ^ salt) < rate·2⁶⁴``. Embarrassingly parallel
(no shuffle, no state), and exactly SQL-expressible — the DuckDB
oracle reproduces splitmix64 in integer SQL (see
``oracle_sql()['sample_stratified_docs']``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import splitmix64

U64 = np.uint64


def _threshold(rate: float) -> np.uint64:
    """rate ∈ [0,1] → inclusive-exclusive uint64 cut, exact at the
    driver so Ray and SQL compare against the SAME integer."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return U64(min(int(rate * 2**64), 2**64 - 1))


def stratified_sample(
    ds,
    *,
    key: str,
    strata_col: str | None = None,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    salt: int = 0,
):
    """Keep each row iff ``splitmix64(key ^ salt)`` falls under its
    stratum's rate threshold. ``rates`` maps stratum value → rate;
    rows whose stratum is absent (or when ``strata_col`` is None) use
    ``default_rate``. Deterministic, stateless, zero exchanges."""
    rate_map = {k: int(_threshold(v)) for k, v in (rates or {}).items()}
    default_cut = int(_threshold(default_rate))
    salt_u = U64(salt)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        hv = splitmix64(keys.astype(U64) ^ salt_u)
        if strata_col is None or not rate_map:
            cuts = np.full(len(keys), default_cut, dtype=U64)
        else:
            strata = batch.column(strata_col).to_pylist()
            cuts = np.fromiter(
                (rate_map.get(s, default_cut) for s in strata),
                dtype=U64,
                count=len(strata),
            )
        return batch.filter(pa.array(hv < cuts))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def per_stratum_sample(
    ds,
    *,
    strata_col: str,
    key: str,
    n: int,
    salt: int = 0,
    num_buckets: int = 64,
):
    """EXACTLY ``n`` rows per stratum (fewer if the stratum is
    smaller) — the balanced-mix primitive for training-data curation.
    Selection is the stratum's top-``n`` by ``splitmix64(key ^ salt)``
    (ties impossible: splitmix64 is a bijection of the key), so
    membership is deterministic and SQL-expressible as a
    ``row_number() OVER (PARTITION BY stratum ORDER BY hash DESC)``
    window.

    One hash exchange: a combiner pre-prune keeps each batch's local
    top-``n`` per stratum, bounding the shuffle at n rows per
    (stratum, batch) — the grouped-top-k pushdown."""
    import pandas as pd

    from ..util import hash64_str
    from .ranking import group_topk_indices

    salt_u = U64(salt)
    schema = ds.schema()
    out_schema = pa.schema(list(zip(schema.names, schema.types)))

    def _keep_topn(df: pd.DataFrame) -> pd.DataFrame:
        hv = splitmix64(df[key].to_numpy().astype(U64) ^ salt_u)
        sel, _ = group_topk_indices(
            df[strata_col].to_numpy(),
            [(hv, False), (df[key].to_numpy(), False)],
            n,
        )
        return df.iloc[np.sort(sel)]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        kept = _keep_topn(df)
        bucket = (
            splitmix64(hash64_str(kept[strata_col].astype(str).tolist()))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return kept.assign(__bucket=bucket)

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return out_schema.empty_table()
        out = _keep_topn(g.drop(columns="__bucket"))
        return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def weighted_sample(
    ds,
    *,
    key: str,
    weight_col: str,
    rate: float,
    salt: int = 0,
):
    """Weight-proportional deterministic sampling: keep a row iff
    ``u < rate · w`` where ``u = splitmix64(key ^ salt) / 2⁶⁴`` — i.e.
    inclusion probability ``min(1, rate·wᵢ)``, reproducible across
    re-runs and partition retries like :func:`stratified_sample`
    (membership is a pure function of the key). Zero exchanges.

    The comparison runs in float64 with one fixed expression shape
    (``CAST(h AS DOUBLE)/2⁶⁴ < rate * w``) so the DuckDB oracle
    evaluates the IDENTICAL IEEE operations — exact twin, no epsilon.
    """
    if rate < 0:
        raise ValueError("rate must be >= 0")
    salt_u = U64(salt)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        hv = splitmix64(keys.astype(U64) ^ salt_u)
        u = hv.astype(np.float64) / 18446744073709551616.0
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(u < rate * w))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
