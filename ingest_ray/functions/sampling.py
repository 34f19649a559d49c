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
