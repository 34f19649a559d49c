"""Term statistics over a documents table — TF / DF / top-terms.

The inverted-index half of a training-data pipeline: per-document
term frequencies, corpus document frequencies, and each document's
top-k most characteristic terms. Characteristic-ness is scored
``tf · (N − df)`` — the integer-exact rarity surrogate for tf-idf
(monotone in idf for fixed tf; chosen over ``tf·ln(N/df)`` so the
score, the ranking, and the DuckDB oracle compare EXACT integers
instead of libm-rounded doubles).

Plan shape (three stages, one exchange on the hot path):

1. ``tf``: per-batch pandas split→explode→group count. No shuffle.
2. ``df``: groupby(term).count over the distinct (doc, term) rows —
   the vocabulary exchange. Vocabulary is sublinear in corpus size;
   below ``broadcast_vocab_limit`` the (term→df) map is ``ray.put``
   ONCE and attached by searchsorted in every tf batch (tf rows never
   shuffle). Beyond it, tf rows bucket by hash(term) and meet their
   df row in one groupby — the standard two-exchange join.
3. top-k per doc: combiner pre-prune (local top-k per (doc, batch))
   bounds the exchange at k rows per doc per batch, then one
   groupby(hash(doc)) ranks with a per-bucket vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import splitmix64

TF_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("term", pa.string()),
        pa.field("tf", pa.int64()),
    ]
)

TOP_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("term", pa.string()),
        pa.field("tf", pa.int64()),
        pa.field("df", pa.int64()),
        pa.field("rank", pa.int64()),
    ]
)


def term_freq_batch(df: pd.DataFrame) -> pd.DataFrame:
    """documents batch → (doc_id, term, tf). Terms are the
    lowercased whitespace tokens of trimmed text (same token contract
    as token_count_batch — matches string_split_regex(trim(text),
    '\\s+') in the oracle); blank docs yield no rows."""
    t = df["text"].fillna("").str.strip()
    nz = t != ""
    frame = pd.DataFrame(
        {"doc_id": df.loc[nz, "doc_id"], "term": t[nz].str.lower().str.split()}
    ).explode("term")
    g = (
        frame.groupby(["doc_id", "term"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    return g.astype({"doc_id": "int64", "tf": "int64"})


def doc_term_freq(docs_ds):
    """documents Dataset → (doc_id, term, tf) Dataset (lazy, no
    shuffle)."""
    return docs_ds.map_batches(term_freq_batch, batch_format="pandas")


def _rank_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Top-k rows per doc by (score desc, term asc), 1-based rank —
    the shared vectorized group-top-k kernel."""
    from .ranking import group_topk_indices

    sel, rank0 = group_topk_indices(
        df["doc_id"].to_numpy(),
        [(df["score"].to_numpy(), False), (df["term"].to_numpy(), True)],
        k,
    )
    return df.iloc[sel].assign(rank=rank0 + 1)


def top_terms(
    docs_ds,
    *,
    k: int = 3,
    num_buckets: int = 64,
    broadcast_vocab_limit: int = 20_000_000,
):
    """documents Dataset → each doc's top-``k`` terms by
    ``tf·(N−df)`` (ties → lexicographically first term). Output:
    (doc_id, term, tf, df, rank)."""
    import ray

    n_docs = docs_ds.count()
    tf_ds = doc_term_freq(docs_ds).materialize()  # consumed twice: df build + attach

    # (term, count()) — distinct docs per term; materialized so the
    # vocabulary shuffle runs ONCE (count() + the attach below would
    # otherwise each re-execute it)
    df_ds = tf_ds.groupby("term").count().materialize()

    def _attach_arrays(batch: pd.DataFrame, terms: np.ndarray, dfs: np.ndarray) -> pd.DataFrame:
        pos = np.searchsorted(terms, batch["term"].to_numpy())
        # every batch term is in the vocabulary by construction
        dfv = dfs[pos]
        score = batch["tf"].to_numpy() * (n_docs - dfv)
        return batch.assign(df=dfv, score=score)

    vocab_size = df_ds.count()
    if vocab_size <= broadcast_vocab_limit:
        vt = pa.concat_tables(
            list(df_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        )
        order = pc.sort_indices(vt.column("term"))
        vt = vt.take(order)
        vocab_ref = ray.put(
            (
                vt.column("term").to_numpy(zero_copy_only=False),
                vt.column("count()").to_numpy(zero_copy_only=False).astype(np.int64),
            )
        )

        def score_prune(batch: pd.DataFrame) -> pd.DataFrame:
            terms, dfs = ray.get(vocab_ref)
            out = _rank_topk(_attach_arrays(batch, terms, dfs), k).drop(columns=["rank"])
            out = out.assign(
                bucket=(
                    splitmix64(out["doc_id"].to_numpy().astype(np.uint64))
                    % np.uint64(num_buckets)
                ).astype(np.int32)
            )
            return out

        scored = tf_ds.map_batches(score_prune, batch_format="pandas")
    else:
        # distributed df attach: tf rows and df rows meet in a
        # hash(term) groupby; only then bucket by doc for ranking
        from ..util import hash64_str

        def tf_side_vec(batch: pd.DataFrame) -> pd.DataFrame:
            hv = hash64_str(batch["term"].tolist())
            return batch.assign(
                df=np.int64(-1),
                tbucket=(splitmix64(hv) % np.uint64(num_buckets)).astype(np.int32),
            )

        def df_side(batch: pd.DataFrame) -> pd.DataFrame:
            hv = hash64_str(batch["term"].tolist())
            return pd.DataFrame(
                {
                    "doc_id": np.full(len(batch), -1, dtype=np.int64),
                    "term": batch["term"],
                    "tf": np.zeros(len(batch), dtype=np.int64),
                    "df": batch["count()"].to_numpy().astype(np.int64),
                    "tbucket": (splitmix64(hv) % np.uint64(num_buckets)).astype(np.int32),
                }
            )

        tagged = tf_ds.map_batches(tf_side_vec, batch_format="pandas").union(
            df_ds.map_batches(df_side, batch_format="pandas")
        )

        def join_df(g: pd.DataFrame) -> pd.DataFrame:
            dfrows = g[g["doc_id"] < 0]
            tfrows = g[g["doc_id"] >= 0]
            if not len(tfrows):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "term": pd.Series([], dtype="object"),
                        "tf": pd.Series([], dtype="int64"),
                        "df": pd.Series([], dtype="int64"),
                        "score": pd.Series([], dtype="int64"),
                        "bucket": pd.Series([], dtype="int32"),
                    }
                )
            terms = dfrows["term"].to_numpy()
            order = np.argsort(terms)
            out = _attach_arrays(
                tfrows.drop(columns=["df", "tbucket"]),
                terms[order],
                dfrows["df"].to_numpy()[order],
            )
            out = _rank_topk(out, k).drop(columns=["rank"])
            return out.assign(
                bucket=(
                    splitmix64(out["doc_id"].to_numpy().astype(np.uint64))
                    % np.uint64(num_buckets)
                ).astype(np.int32)
            )

        scored = tagged.groupby("tbucket").map_groups(join_df, batch_format="pandas")

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return TOP_SCHEMA.empty_table()
        out = _rank_topk(g, k)
        return pa.Table.from_pandas(
            out[["doc_id", "term", "tf", "df", "rank"]], preserve_index=False
        ).cast(TOP_SCHEMA)

    return scored.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")
