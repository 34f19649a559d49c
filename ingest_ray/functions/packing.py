"""Sequence packing — the distributed prefix-sum over a document
stream.

LLM training packs documents back-to-back into fixed-length token
sequences; each doc needs its GLOBAL token offset, i.e. an ordered
prefix sum over the corpus — the classic scan primitive a pure
map/groupby engine lacks. Plan (two small exchanges, fully
distributed):

1. per-batch token counts (no shuffle, token_count semantics);
2. range-bucket by doc_id (order-preserving buckets — ids are dense
   by contract, so equal-width ranges balance; a skewed id space
   would want equi-depth splits from a quantile sketch);
3. per-bucket token sums → driver exclusive scan over the ~B bucket
   totals (B numbers, not B rows) → broadcast bases;
4. one groupby(bucket): sort by doc_id inside the bucket, vectorized
   cumsum + the bucket base = every doc's global start offset.

Output: (doc_id, n_tokens, start_tok, seq_id, offset_in_seq) where
seq_id = start_tok // seq_len — docs assigned to training sequences
greedily in doc_id order, split-agnostic (a doc straddling a
boundary starts in seq_id at offset_in_seq; the consumer slices).
Oracled against a SQL window cumsum (integer-exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("start_tok", pa.int64()),
        pa.field("seq_id", pa.int64()),
        pa.field("offset_in_seq", pa.int64()),
    ]
)


def pack_sequences(
    docs_ds, *, seq_len: int = 2048, num_buckets: int = 64, bucketing: str = "width"
):
    """documents Dataset → per-doc global token offsets and sequence
    assignment (doc_id order).

    ``bucketing="width"`` (default) splits the id span into equal-width
    ranges — balanced when ids are dense (the testdata/reference
    contract). ``bucketing="depth"`` spends one extra pass on an exact
    quantile sketch of the (small) counts table and uses equi-depth
    splits instead — balanced under ANY id skew (output is identical;
    property-tested). Ids must stay < 2⁵³ on the depth path (float64
    split edges)."""
    from .text import token_count_batch

    counts = docs_ds.map_batches(token_count_batch, batch_format="pandas").materialize()
    if counts.count() == 0:
        return __import__("ray").data.from_arrow(OUT_SCHEMA.empty_table())

    if bucketing == "depth":
        from .quantiles import equi_depth_splits

        splits = equi_depth_splits(counts, col="doc_id", num_buckets=num_buckets)

        def _bucket_of(ids: np.ndarray) -> np.ndarray:
            return np.searchsorted(splits, ids.astype(np.float64), side="right").astype(
                np.int32
            )

    else:
        # id range for order-preserving buckets (one pass over the small
        # (doc_id, n_tokens) table, not the corpus)
        from ray.data.aggregate import Max, Min

        agg = counts.aggregate(Min("doc_id"), Max("doc_id"))
        lo, hi = int(agg["min(doc_id)"]), int(agg["max(doc_id)"])
        span = max(hi - lo + 1, 1)

        def _bucket_of(ids: np.ndarray) -> np.ndarray:
            if span <= 2**62 // num_buckets:
                return ((ids - lo) * num_buckets // span).astype(np.int32)
            # extreme id spans would wrap the int64 multiply (breaking
            # bucket monotonicity → wrong prefix order); float division is
            # monotone, and bucket boundaries only need monotonicity
            b = ((ids - lo).astype(np.float64) * num_buckets / span).astype(np.int64)
            return np.clip(b, 0, num_buckets - 1).astype(np.int32)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=_bucket_of(df["doc_id"].to_numpy()))

    tagged = counts.map_batches(tag, batch_format="pandas").materialize()

    # per-bucket totals → driver exclusive scan (num_buckets scalars)
    from ray.data.aggregate import Sum

    totals = tagged.groupby("bucket").aggregate(Sum("n_tokens", alias_name="tok")).to_pandas()
    bases = np.zeros(num_buckets + 1, dtype=np.int64)
    per = np.zeros(num_buckets, dtype=np.int64)
    per[totals["bucket"].to_numpy()] = totals["tok"].to_numpy()
    bases[1:] = np.cumsum(per)

    def scan_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return OUT_SCHEMA.empty_table()
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy().astype(np.int64)
        start = int(bases[int(g["bucket"].iloc[0])]) + np.cumsum(n) - n
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "n_tokens": n,
                    "start_tok": start,
                    "seq_id": start // seq_len,
                    "offset_in_seq": start % seq_len,
                }
            ),
            preserve_index=False,
        ).cast(OUT_SCHEMA)

    return tagged.groupby("bucket").map_groups(scan_bucket, batch_format="pandas")


SHUFFLE_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("pos", pa.int64())]
)


def global_shuffle_order(ds, *, key: str = "doc_id", salt: int = 0, num_buckets: int = 64):
    """Deterministic global training-data shuffle: every key gets a
    dense permutation position ``pos ∈ [0, N)`` ordered by
    ``splitmix64(key ^ salt)`` (ties broken by key, so the permutation
    is a pure function of (key set, salt) — re-runs, retries and
    different partitionings all produce the SAME order, unlike
    ``Dataset.random_shuffle``).

    Plan mirrors :func:`pack_sequences`' scan: hash values are uniform
    in [0, 2⁶⁴), so EQUAL-WIDTH hash ranges are balanced buckets no
    matter how skewed the key space is (no quantile sketch needed);
    per-bucket counts → driver exclusive scan over ``num_buckets``
    scalars → per-bucket sort + arange + base. Two small exchanges,
    nothing corpus-sized on the driver.
    """
    from ..util import splitmix64

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(k.astype(np.uint64) ^ np.uint64(salt))
        # fixed-point multiply keeps the bucket fn monotone in h for
        # ANY num_buckets (no power-of-two requirement)
        bk = (((h >> np.uint64(32)) * np.uint64(num_buckets)) >> np.uint64(32)).astype(
            np.int32
        )
        return pa.table(
            {
                "bucket": pa.array(bk, pa.int32()),
                "doc_id": pa.array(k, pa.int64()),
                "h": pa.array(h, pa.uint64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).materialize()

    from ray.data.aggregate import Count

    per = np.zeros(num_buckets, dtype=np.int64)
    cnt = tagged.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    per[cnt["bucket"].to_numpy()] = cnt["n"].to_numpy()
    bases = np.zeros(num_buckets + 1, dtype=np.int64)
    bases[1:] = np.cumsum(per)

    def rank_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return SHUFFLE_SCHEMA.empty_table()
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h))
        base = int(bases[int(t.column("bucket")[0].as_py())])
        pos = np.empty(len(k), dtype=np.int64)
        pos[order] = base + np.arange(len(k), dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(k, pa.int64()), "pos": pa.array(pos, pa.int64())}
        ).cast(SHUFFLE_SCHEMA)

    return tagged.groupby("bucket").map_groups(rank_bucket, batch_format="pyarrow")
