"""Shared vectorized per-group top-k selection.

One lexsort + segment cumcount over numpy arrays — the combiner/rank
kernel behind grouped_topk, per_stratum_sample and top_terms (one
implementation instead of three pandas sort+cumcount copies). String
columns factorize through np.unique (codes are lexicographic, so
ordering is preserved); descending order negates/complements within
the dtype.
"""

from __future__ import annotations

import numpy as np


def _sort_key(arr: np.ndarray, ascending: bool) -> np.ndarray:
    """Array → int/float key whose ASCENDING lexsort order equals the
    requested order of ``arr``."""
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        _, codes = np.unique(arr, return_inverse=True)
        return codes if ascending else -codes
    if arr.dtype.kind == "u":
        return arr if ascending else ~arr  # complement reverses unsigned order
    return arr if ascending else -arr


def group_topk_indices(
    group: np.ndarray,
    order: list[tuple[np.ndarray, bool]],
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Indices of each group's top-``k`` rows under ``order``
    ([(column, ascending), ...], first entry = primary), plus the
    0-based within-group rank of each kept row."""
    n = len(group)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    gkey = _sort_key(group, True)
    keys = [_sort_key(a, asc) for a, asc in reversed(order)] + [gkey]
    idx = np.lexsort(tuple(keys))
    gs = gkey[idx] if gkey.ndim else gkey
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(newg)
    seg_of = np.cumsum(newg) - 1
    rank0 = np.arange(n, dtype=np.int64) - starts[seg_of]
    keep = rank0 < k
    return idx[keep], rank0[keep]
