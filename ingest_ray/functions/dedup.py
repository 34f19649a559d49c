"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each documented per function): exact dedup and the LSH
band buckets are hash-partitioned groupbys (shuffle only the keys +
compact sketches, never full texts where avoidable); the all-pairs
variants exist as *oracle-checkable* ground truth at test scale and
state their quadratic cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import hash64_str, splitmix64
from .text import _WS, shingles

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """Group by exact text → (keep_id = min doc_id, dup_count).

    Pattern: content hash in a vectorized map_batches, then a groupby
    over (hash) with per-group first — the hash-partition + per-group
    first of SURVEY.md §2.5 O3. Texts never shuffle; only (hash,
    doc_id) pairs do.
    """
    import pyarrow.compute as pc

    def hash_stage(batch: pa.Table) -> pa.Table:
        h = hash64_str(batch.column("text").to_pylist())
        return pa.table(
            {
                "text_hash": pa.array(h, pa.uint64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    hashed = docs_ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count, Min

    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="dup_count")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MINHASH_SEEDS = np.arange(1, 257, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV_PRIME = np.uint64(0x100000001B3)


def minhash_signature(sh: set[int], num_hashes: int = 64) -> np.ndarray:
    if not sh:
        return np.full(num_hashes, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    arr = np.fromiter(sh, dtype=np.uint64)
    # one splitmix per seed: min over (shingle ^ seed) mixed
    sig = np.empty(num_hashes, dtype=np.uint64)
    for i in range(num_hashes):
        sig[i] = splitmix64(arr ^ _MINHASH_SEEDS[i]).min()
    return sig


def shingle_hashes_batch(
    texts: list, n: int = 3, unique: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch word n-gram shingle hashing → (flat uint64 hashes,
    int64 doc offsets).

    Gram hashes combine consecutive word hashes (vectorized FNV over
    every word of the batch, then one numpy pass per gram position)
    instead of building per-gram strings — no per-doc Python beyond the
    word split. Docs with 0 < words < n get one shingle mixing all
    their words. ``unique=True`` dedupes within each doc (set
    semantics, needed for exact Jaccard; MinHash mins are unaffected).
    """
    ndocs = len(texts)
    words_per_doc = [(_WS.split(t.strip()) if (t or "").strip() else []) for t in texts]
    wcounts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=ndocs)
    wh = hash64_str([w for ws in words_per_doc for w in ws])
    woffs = np.cumsum(wcounts) - wcounts
    g_counts = np.where(wcounts == 0, 0, np.maximum(wcounts - (n - 1), 1))
    g_offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(g_counts, out=g_offs[1:])
    total = int(g_offs[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), g_offs
    doc_of = np.repeat(np.arange(ndocs), g_counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(g_offs[:-1], g_counts)
    gstart = woffs[doc_of] + within
    doc_end = (woffs + wcounts)[doc_of]
    acc = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(n):
            idx = gstart + k
            valid = idx < doc_end
            if not valid.any():
                break
            acc[valid] = (acc[valid] ^ wh[idx[valid]]) * _FNV_PRIME
    flat = splitmix64(acc)
    if not unique:
        return flat, g_offs
    order = np.lexsort((flat, doc_of))
    sd, sf = doc_of[order], flat[order]
    keep = np.empty(total, dtype=bool)
    keep[0] = True
    keep[1:] = (sd[1:] != sd[:-1]) | (sf[1:] != sf[:-1])
    u_counts = np.bincount(sd[keep], minlength=ndocs)
    u_offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(u_counts, out=u_offs[1:])
    return sf[keep], u_offs


def minhash_matrix(flat: np.ndarray, offs: np.ndarray, num_hashes: int = 64) -> np.ndarray:
    """Matrix-form MinHash: (ndocs, num_hashes) uint64 over per-doc
    shingle segments — num_hashes vectorized splitmix+reduceat passes,
    zero per-doc Python (the per-doc 64-pass loop was the dominant cost
    of the LSH pipeline)."""
    ndocs = len(offs) - 1
    sig = np.full((ndocs, num_hashes), _U64_MAX)
    if len(flat) == 0 or ndocs == 0:
        return sig
    # reduceat over NONEMPTY doc starts only: empty docs have zero
    # width, so consecutive nonempty starts delimit exact segments
    # (clipping empty starts into range would shift real boundaries)
    ne_idx = np.flatnonzero(np.diff(offs) > 0)
    ne_starts = offs[:-1][ne_idx]
    for j in range(num_hashes):
        h = splitmix64(flat ^ _MINHASH_SEEDS[j])
        sig[ne_idx, j] = np.minimum.reduceat(h, ne_starts)
    return sig


def band_hash_matrix(sig: np.ndarray, bands: int) -> np.ndarray:
    """(ndocs, bands) uint64 band bucket hashes from a signature matrix
    (same per-band mix as the scalar path: xor-fold the band's rows,
    salt by band id, splitmix)."""
    ndocs, num_hashes = sig.shape
    rows = num_hashes // bands
    bh = np.empty((ndocs, bands), dtype=np.uint64)
    for b in range(bands):
        x = np.bitwise_xor.reduce(sig[:, b * rows : (b + 1) * rows], axis=1)
        bh[:, b] = splitmix64(x ^ np.uint64(b * 1315423911))
    return bh


def _distinct_pairs(pairs_ds, extra: dict[str, str] | None = None):
    """Distinct (a, b) pairs via an AGGREGATE over the two-column pair
    key — no per-pair ``map_groups`` dispatch (that pattern pays a
    pandas call per unique pair), and no packed key (a ``(a<<32)|b``
    pack silently merges distinct pairs once doc ids exceed 2³², which
    the declared 10¹²-doc scale requires). ``extra`` maps output column
    → source column carried through with Min (pair-constant columns
    only)."""
    from ray.data.aggregate import Min

    aggs = [Min(src, alias_name=out) for out, src in (extra or {}).items()]
    grouped = (
        pairs_ds.groupby(["a", "b"]).aggregate(*aggs)
        if aggs
        else pairs_ds.groupby(["a", "b"]).count()
    )
    return grouped.select_columns(["a", "b", *list((extra or {}).keys())])


def minhash_lsh_candidates(
    docs_ds,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    bucket_cap: int = 4096,
    distinct: bool = True,
):
    """documents → candidate near-dup pairs via banded MinHash LSH.

    Stages: matrix-form shingle+minhash per batch (vectorized, see
    :func:`minhash_matrix`) → explode to (band_id, band_hash, doc_id)
    rows → groupby(band) → per-bucket pairs. The groupby shuffles only
    (band_hash, doc_id) — the scale path of the guide's near-dup
    recipe. Returns Dataset (a, b) with a < b, distinct (aggregate
    dedup, no per-pair dispatch).

    ``bucket_cap`` bounds the per-bucket pair expansion: a bucket of k
    near-identical docs emits O(k²) pairs, so a hot bucket (mass exact
    dups) can explode the exchange. Buckets over the cap keep only the
    pairs linking each doc to the bucket's min id (k-1 pairs — enough
    to preserve the CONNECTIVITY of the dup cluster for group
    assignment, see :func:`minhash_dedup_assign`); the truncation is
    recorded in a ``capped`` column so callers can see it happened.
    """

    def sig_stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = shingle_hashes_batch(texts, shingle_n, unique=False)
        sig = minhash_matrix(flat, offs, num_hashes)
        bh = band_hash_matrix(sig, bands)
        n = len(doc_ids)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "bh": pa.array(bh.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
            }
        )

    exploded = docs_ds.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)

    NB = 64  # coarse shuffle buckets — NOT one group per LSH bucket:
    # groupby((band, bh)) dispatches a pandas call per distinct bucket
    # (≈ bands × corpus), measured as the dominant cost of this stage;
    # a coarse hash bucket + one vectorized expansion per coarse group
    # generates the same pairs with O(NB) dispatches

    def coarse_bucket(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = batch.column("bh").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(bh ^ (band * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(NB)).astype(
            np.int32
        )
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = exploded.map_batches(coarse_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "capped": pd.Series([], dtype="bool"),
            }
        )
        if len(df) < 2:
            return empty
        band = df["band"].to_numpy().astype(np.int64)
        bh = df["bh"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        newseg = np.empty(len(ids), dtype=bool)
        newseg[0] = True
        newseg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        seg_of = np.cumsum(newseg) - 1
        seg_sizes = np.bincount(seg_of)
        k = seg_sizes[seg_of]  # segment size at each element
        seg_starts = np.cumsum(seg_sizes) - seg_sizes
        local = np.arange(len(ids), dtype=np.int64) - seg_starts[seg_of]
        over = k > bucket_cap
        # full triangular expansion below the cap; star expansion
        # (min id ↔ each other, connectivity preserved) above it
        reps = np.where(over, np.where(local == 0, k - 1, 0), k - 1 - local)
        tot = int(reps.sum())
        if tot == 0:
            return empty
        first = np.cumsum(reps) - reps
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, reps)
        src = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        a = ids[src]
        b = ids[src + 1 + within]
        return pd.DataFrame({"a": a, "b": b, "capped": np.repeat(over, reps)})

    pairs = bucketed.groupby("bucket").map_groups(expand, batch_format="pandas")
    if not distinct:
        # the distributed verifier dedupes (pk, side) itself — skipping
        # the aggregate here saves a whole shuffle round
        return pairs
    return _distinct_pairs(pairs, extra={"capped": "capped"})


def verify_jaccard_pairs(pairs_ds, docs_table: pa.Table, threshold: float, shingle_n: int = 3):
    """Candidate pairs → exact shingle-Jaccard filter over a broadcast
    sketch table (small-corpus path; use
    :func:`verify_jaccard_pairs_distributed` at scale — same output,
    no corpus broadcast)."""
    import ray

    ids = docs_table.column("doc_id").to_numpy(zero_copy_only=False)
    texts = docs_table.column("text").to_pylist()
    flat, offs = shingle_hashes_batch(texts, shingle_n, unique=True)
    ref = ray.put(
        {
            int(ids[i]): set(flat[offs[i] : offs[i + 1]].tolist())
            for i in range(len(ids))
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(a, b):
            sa, sb = sh.get(int(x), set()), sh.get(int(y), set())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 0.0
            if j >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                jac.append(j)
        return pa.table(
            {
                "a": pa.array(keep_a, pa.int64()),
                "b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return pairs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def minhash_dedup_assign(
    docs_ds,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    num_partitions: int = 32,
    lp_edge_threshold: int | None = 4_000_000,
    rep_broadcast_limit: int = 4_000_000,
):
    """documents → (doc_id, keep_id): near-dup CLUSTER assignment.

    The linear-output dedup operator a 100 TB pipeline actually runs —
    the all-pairs surface is inherently quadratic under mass
    duplication, so:

    1. **exact pre-collapse**: content-hash → groupby → representative
       = min(doc_id). Identical docs never enter LSH, which also
       removes the hot-bucket explosion at its source;
    2. banded MinHash LSH over representatives only, then exact
       shingle-Jaccard verification via the distributed (no-broadcast)
       verifier;
    3. the verified rep-pair edge list — bounded by the near-dup rate
       over *distinct* texts, orders of magnitude below corpus size —
       is union-found on the driver; ``keep_id`` = cluster minimum,
       composed with the exact-dup mapping. When the edge list exceeds
       ``lp_edge_threshold`` (the driver-collect assumption breaking),
       assignment switches to the fully distributed
       :func:`label_propagation_components` instead — no driver edge
       materialization at any near-dup rate (``None`` disables the
       check and always union-finds).
    """
    from ray.data.aggregate import Min

    from ..util import effective_num_partitions, tune_shuffle_context

    def hash_stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        h = hash64_str([t or "" for t in texts])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # int64 view: join/groupby keys stay native Arrow types
                "text_hash": pa.array(h.view(np.int64), pa.int64()),
                "text": batch.column("text"),
            }
        )

    hashed = docs_ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    reps = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="rep"))
    # rep attachment: the (hash → rep) map is bounded by the DISTINCT
    # text count. When the CORPUS row count (≥ distinct count, cheap —
    # parquet metadata) fits the broadcast limit, ship the sorted map
    # once via ray.put and attach per batch — the corpus TEXT never
    # rides an exchange and no join-aggregator pool spins up. Beyond
    # the limit, the distributed hash join runs (text shuffles once) —
    # same threshold-guard-with-fallback pattern as the verifier's id
    # prefilter.
    n_docs = None
    try:
        n_docs = docs_ds.count()
    except Exception:
        pass
    if n_docs is not None and n_docs <= rep_broadcast_limit:
        rep_parts = [
            t
            for t in reps.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if len(t)
        ]
        rt = (
            pa.concat_tables(rep_parts)
            if rep_parts
            else pa.table(
                {"text_hash": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())}
            )
        )
        th = rt.column("text_hash").to_numpy(zero_copy_only=False).astype(np.int64)
        rp = rt.column("rep").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(th, kind="stable")
        rep_ref = __import__("ray").put((th[order], rp[order]))

        def attach_rep(batch: pa.Table) -> pa.Table:
            import ray as _ray

            keys, vals = _ray.get(rep_ref)
            bh = batch.column("text_hash").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, bh)
            pos = np.minimum(pos, max(len(keys) - 1, 0))
            if len(bh) and (not len(keys) or not np.array_equal(keys[pos], bh)):
                raise ValueError("rep map missing a text_hash — broken invariant")
            return batch.append_column(
                "rep", pa.array(vals[pos] if len(keys) else [], pa.int64())
            )

        membership = hashed.map_batches(
            attach_rep, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        reps = reps.rename_columns({"text_hash": "th"})
        tune_shuffle_context()
        membership = hashed.join(
            reps,
            join_type="inner",
            num_partitions=effective_num_partitions(num_partitions),
            on=("text_hash",),
            right_on=("th",),
        )
        membership = membership.materialize()
    rep_docs = membership.filter(
        expr="doc_id == rep"
    ).select_columns(["doc_id", "text"])
    cands = minhash_lsh_candidates(
        rep_docs, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n, distinct=False
    )
    verified = verify_jaccard_pairs_distributed(
        cands, rep_docs, threshold=threshold, shingle_n=shingle_n
    )
    if lp_edge_threshold is not None:
        verified = verified.materialize()
        if verified.count() > lp_edge_threshold:
            # extreme near-dup rate: the edge list no longer fits the
            # driver — distributed label propagation replaces union-find
            labels = label_propagation_components(verified)
            joined = membership.select_columns(["doc_id", "rep"]).join(
                labels,
                join_type="left_outer",
                num_partitions=effective_num_partitions(num_partitions),
                on=("rep",),
                right_on=("node",),
            )

            def pick(t: pa.Table) -> pa.Table:
                # coalesce nulls in Arrow int64 — a float64 round-trip
                # would corrupt ids >= 2^53 at the declared corpus scale
                import pyarrow.compute as pc

                rep = t.column("rep").cast(pa.int64())
                lab = pc.coalesce(t.column("label").cast(pa.int64()), rep)
                return pa.table(
                    {"doc_id": t.column("doc_id").cast(pa.int64()), "keep_id": lab}
                )

            return joined.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    # numpy fold, not per-row tuples: bounded by lp_edge_threshold (4M)
    # but a Python-tuple materialization at the cap costs ~10x this
    _parts = [
        np.column_stack([df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])
        for df in verified.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 18, batch_format="pandas"
        )
    ]
    edges = np.concatenate(_parts) if _parts else np.empty((0, 2), dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    root_of = {x: find(x) for x in parent}
    import ray

    root_ref = ray.put(root_of)

    def assign(batch: pa.Table) -> pa.Table:
        roots = ray.get(root_ref)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        rep = batch.column("rep").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(rep, return_inverse=True)  # dict hits on unique reps only
        mapped = np.fromiter((roots.get(int(r), int(r)) for r in u), dtype=np.int64, count=len(u))
        keep = mapped[inv]
        return pa.table(
            {"doc_id": pa.array(doc, pa.int64()), "keep_id": pa.array(keep, pa.int64())}
        )

    return membership.select_columns(["doc_id", "rep"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def verify_jaccard_pairs_distributed(
    pairs_ds,
    docs_ds,
    threshold: float,
    shingle_n: int = 3,
    num_buckets: int = 64,
    max_filter_ids: int = 4_000_000,
):
    """Candidate pairs → exact shingle-Jaccard filter WITHOUT broadcasting
    the corpus (the scale path; output equals
    :func:`verify_jaccard_pairs`, property-tested). Accepts
    non-distinct candidates (pairs repeated across LSH bands) — dedup
    happens inside the pair-key groupby, so callers can skip a whole
    distinct-aggregate shuffle.

    Plan (two hash shuffles, everything per-bucket vectorized):

    1. docs → (key=doc_id, sketch) rows; pairs → (key=a, pk, side=0)
       and (key=b, pk, side=1) rows. Union, bucket by ``hash(key)``,
       one groupby: each bucket attaches the key's sketch to its pair
       rows (sorted-ids searchsorted, no per-key dispatch). Sketches
       cross the wire ONCE each — vs (corpus × workers) for the
       broadcast.
    2. bucket by ``pk``, one groupby: each pair's two sketch halves
       meet; |A∩B| via one lexsort over (pair, value) and an
       adjacent-duplicate count — exact set Jaccard, zero per-pair
       Python.

    When the candidate id set is provably small (≤ ``max_filter_ids``),
    it is broadcast as a sorted array and the corpus is pre-filtered to
    candidate docs before sketching — only docs that can matter are
    sketched or shuffled. Beyond that bound the full sketch shuffle
    runs (the id set would no longer be broadcast-safe).
    """
    import ray

    from ..util import splitmix64 as _mix

    SK_TYPE = pa.list_(pa.uint64())

    pairs_ds = pairs_ds.materialize()
    id_filter_ref = None
    try:
        n_pairs = pairs_ds.count()
    except Exception:
        n_pairs = None
    if n_pairs is not None and n_pairs <= max_filter_ids:
        idset: set[int] = set()
        for df in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 20, batch_format="pandas"
        ):
            idset.update(df["a"].tolist())
            idset.update(df["b"].tolist())
        arr = np.fromiter(idset, dtype=np.int64, count=len(idset))
        arr.sort()
        id_filter_ref = ray.put(arr)

    def sketch_stage(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if id_filter_ref is not None:
            cand = ray.get(id_filter_ref)
            pos = np.searchsorted(cand, ids)
            pos_c = np.clip(pos, 0, max(len(cand) - 1, 0))
            keep = (pos < len(cand)) & (cand[pos_c] == ids) if len(cand) else np.zeros(len(ids), bool)
            if not keep.all():
                sel = np.flatnonzero(keep)
                batch = batch.take(pa.array(sel, pa.int64()))
                ids = ids[sel]
        texts = batch.column("text").to_pylist()
        flat, offs = shingle_hashes_batch(texts, shingle_n, unique=True)
        z = np.zeros(len(ids), dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(ids, pa.int64()),
                # the pair key travels as TWO int64 columns — a packed
                # (a<<32)|b key breaks silently past 2³² doc ids
                "pa": pa.array(z, pa.int64()),
                "pb": pa.array(z, pa.int64()),
                "side": pa.array(np.full(len(ids), -1, dtype=np.int8), pa.int8()),
                "sk": pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32), pa.int32()), pa.array(flat, pa.uint64())
                ),
            }
        )

    def pair_side(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([a, b])
        pa2 = np.concatenate([a, a])
        pb2 = np.concatenate([b, b])
        side = np.concatenate(
            [np.zeros(len(a), dtype=np.int8), np.ones(len(b), dtype=np.int8)]
        )
        n2 = len(key)
        empty_offs = pa.array(np.zeros(n2 + 1, dtype=np.int32), pa.int32())
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "pa": pa.array(pa2, pa.int64()),
                "pb": pa.array(pb2, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "sk": pa.ListArray.from_arrays(empty_offs, pa.array([], pa.uint64())),
            }
        )

    docs_rows = docs_ds.map_batches(sketch_stage, batch_format="pyarrow", zero_copy_batch=True)
    pair_rows = pairs_ds.map_batches(pair_side, batch_format="pyarrow", zero_copy_batch=True)
    unioned = docs_rows.union(pair_rows)

    def add_key_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_mix(k.view(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = unioned.map_batches(add_key_bucket, batch_format="pyarrow", zero_copy_batch=True)

    HALF_SCHEMA = pa.schema(
        [
            pa.field("pa", pa.int64()),
            pa.field("pb", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("sk", SK_TYPE),
        ]
    )

    def attach(df: pd.DataFrame) -> pa.Table:
        side = df["side"].to_numpy(dtype=np.int8)
        is_doc = side < 0
        keys = df["key"].to_numpy(dtype=np.int64)
        doc_keys = keys[is_doc]
        doc_sk = df["sk"].to_numpy()[is_doc]  # object array of np arrays
        order = np.argsort(doc_keys, kind="stable")
        doc_keys = doc_keys[order]
        doc_sk = doc_sk[order]
        pmask = ~is_doc
        pkeys = keys[pmask]
        ppa = df["pa"].to_numpy()[pmask].astype(np.int64)
        ppb = df["pb"].to_numpy()[pmask].astype(np.int64)
        pside = side[pmask]
        if len(ppa) == 0:
            return HALF_SCHEMA.empty_table()
        # dedupe (pair, side): candidates repeat across LSH bands
        so = np.lexsort((pside, ppb, ppa))
        firsts = np.empty(len(so), dtype=bool)
        firsts[0] = True
        firsts[1:] = (
            (ppa[so][1:] != ppa[so][:-1])
            | (ppb[so][1:] != ppb[so][:-1])
            | (pside[so][1:] != pside[so][:-1])
        )
        sel = so[firsts]
        pkeys, ppa, ppb, pside = pkeys[sel], ppa[sel], ppb[sel], pside[sel]
        pos = np.searchsorted(doc_keys, pkeys)
        pos_c = np.clip(pos, 0, max(len(doc_keys) - 1, 0))
        hit = (
            (pos < len(doc_keys)) & (doc_keys[pos_c] == pkeys)
            if len(doc_keys)
            else np.zeros(len(pkeys), dtype=bool)
        )
        empty = np.empty(0, dtype=np.uint64)
        sk_out = [
            (np.asarray(doc_sk[pos_c[i]], dtype=np.uint64) if hit[i] else empty)
            for i in range(len(ppa))
        ]
        return pa.table(
            {
                "pa": pa.array(ppa, pa.int64()),
                "pb": pa.array(ppb, pa.int64()),
                "side": pa.array(pside, pa.int8()),
                "sk": pa.array(sk_out, SK_TYPE),
            }
        ).cast(HALF_SCHEMA)

    halves = bucketed.groupby("bucket").map_groups(attach, batch_format="pandas")

    def add_pk_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("pa").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = batch.column("pb").to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix(_mix(a.view(np.uint64)) ^ bb.view(np.uint64))
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    halved = halves.map_batches(add_pk_bucket, batch_format="pyarrow", zero_copy_batch=True)

    OUT_SCHEMA = pa.schema(
        [
            pa.field("a", pa.int64()),
            pa.field("b", pa.int64()),
            pa.field("jaccard", pa.float64()),
        ]
    )

    def join_halves(df: pd.DataFrame) -> pa.Table:
        pa_ = df["pa"].to_numpy().astype(np.int64)
        if len(pa_) == 0:
            return OUT_SCHEMA.empty_table()
        pb_ = df["pb"].to_numpy().astype(np.int64)
        side = df["side"].to_numpy(dtype=np.int8)
        sk = df["sk"].to_numpy()  # object array of np arrays
        # dedupe (pair, side) again: band duplicates may have attached
        # in DIFFERENT key buckets, so the first dedupe can't see them all
        so = np.lexsort((side, pb_, pa_))
        firsts = np.empty(len(so), dtype=bool)
        firsts[0] = True
        firsts[1:] = (
            (pa_[so][1:] != pa_[so][:-1])
            | (pb_[so][1:] != pb_[so][:-1])
            | (side[so][1:] != side[so][:-1])
        )
        order = so[firsts]
        a_s, b_s = pa_[order], pb_[order]
        new = np.empty(len(a_s), dtype=bool)
        new[0] = True
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        grp_of = np.cumsum(new) - 1
        npairs = int(grp_of[-1]) + 1
        lens = np.fromiter((len(sk[i]) for i in order), dtype=np.int64, count=len(a_s))
        flat = (
            np.concatenate([np.asarray(sk[i], dtype=np.uint64) for i in order])
            if lens.sum()
            else np.empty(0, dtype=np.uint64)
        )
        seg_of = np.repeat(grp_of, lens)
        sizes = np.bincount(grp_of, weights=lens, minlength=npairs).astype(np.int64)
        inter = np.zeros(npairs, dtype=np.int64)
        if len(flat):
            so2 = np.lexsort((flat, seg_of))
            fs, ss = flat[so2], seg_of[so2]
            dup = (fs[1:] == fs[:-1]) & (ss[1:] == ss[:-1])
            inter = np.bincount(ss[1:][dup], minlength=npairs).astype(np.int64)
        union = sizes - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a_s[new][keep], pa.int64()),
                "b": pa.array(b_s[new][keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        ).cast(OUT_SCHEMA)

    return halved.groupby("bucket").map_groups(join_halves, batch_format="pandas")


# --------------------------------------------------------------------------
# n-gram Jaccard (exact all-pairs — oracle ground truth, O(n²) stated)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(docs_ds, docs_table: pa.Table, threshold: float = 0.5):
    """All-pairs word-set Jaccard ≥ threshold → (a, b) pairs.

    DuckDB-oracle-matched semantics: word sets are DISTINCT whitespace
    tokens of trimmed text. Quadratic by design (ground truth for the
    LSH variant); the Ray side distributes the outer loop over batches
    against a broadcast token-set table.
    """
    import ray

    ids = docs_table.column("doc_id").to_numpy(zero_copy_only=False)
    texts = docs_table.column("text").to_pylist()
    sets = [frozenset(_WS.split((t or "").strip())) if (t or "").strip() else frozenset() for t in texts]
    ref = ray.put((ids.astype(np.int64), sets))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, all_sets = ray.get(ref)
        a_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        a_texts = batch.column("text").to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(a_ids)):
            t = (a_texts[i] or "").strip()
            sa = frozenset(_WS.split(t)) if t else frozenset()
            for j in range(len(all_ids)):
                if all_ids[j] <= a_ids[i]:
                    continue
                sb = all_sets[j]
                u = len(sa | sb)
                jac = (len(sa & sb) / u) if u else 0.0
                if jac >= threshold:
                    out_a.append(int(a_ids[i]))
                    out_b.append(int(all_ids[j]))
                    out_j.append(round(jac, 6))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, simhash (uint64) — 64-bit SimHash over word hashes.

    Vectorized over the whole batch: one FNV pass over every word, one
    (words × 64) bit expansion, per-doc vote sums via reduceat, direct
    bit packing — replaces the per-doc loop + binary-string build
    (same outputs, unit-tested)."""
    out = np.zeros(len(df), dtype=np.uint64)
    texts = df["text"].fillna("")
    words_per_doc = [(_WS.split(t.strip()) if t.strip() else []) for t in texts]
    counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=len(df))
    flat_words = [w for ws in words_per_doc for w in ws]
    if flat_words:
        hs = hash64_str(flat_words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int8
        )
        signed = (2 * bits - 1).astype(np.int32)
        ne = np.flatnonzero(counts > 0)
        starts = (np.cumsum(counts) - counts)[ne]
        votes = np.add.reduceat(signed, starts, axis=0)  # (ne_docs, 64)
        packed = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[ne] = packed
    return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})


def simhash_near_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup candidates: band the 64 bits into 4×16-bit
    chunks (any pair within hamming ≤3 shares ≥1 exact chunk —
    pigeonhole), groupby chunk, verify hamming exactly."""
    def sig(df: pd.DataFrame) -> pd.DataFrame:
        return simhash_batch(df)

    sigs = docs_ds.map_batches(sig, batch_format="pandas")

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        outs = []
        for c in range(4):
            chunk = (h >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            outs.append(
                pa.table(
                    {
                        "chunk_id": pa.array(np.full(len(h), c, dtype=np.int32), pa.int32()),
                        "chunk": pa.array(chunk, pa.uint64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "simhash": pa.array(h, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    exploded = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    NB = 64  # coarse buckets — one vectorized expansion per coarse
    # group instead of a pandas dispatch per (chunk_id, chunk) bucket

    def coarse_bucket(batch: pa.Table) -> pa.Table:
        cid = batch.column("chunk_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        ch = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(ch ^ (cid * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(NB)).astype(
            np.int32
        )
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = exploded.map_batches(coarse_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        if len(df) < 2:
            return empty
        cid = df["chunk_id"].to_numpy().astype(np.int64)
        ch = df["chunk"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        hs = df["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, ch, cid))
        cid, ch, ids, hs = cid[order], ch[order], ids[order], hs[order]
        newseg = np.empty(len(ids), dtype=bool)
        newseg[0] = True
        newseg[1:] = (cid[1:] != cid[:-1]) | (ch[1:] != ch[:-1])
        seg_of = np.cumsum(newseg) - 1
        seg_sizes = np.bincount(seg_of)
        k = seg_sizes[seg_of]
        seg_starts = np.cumsum(seg_sizes) - seg_sizes
        local = np.arange(len(ids), dtype=np.int64) - seg_starts[seg_of]
        reps = k - 1 - local
        tot = int(reps.sum())
        if tot == 0:
            return empty
        first = np.cumsum(reps) - reps
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, reps)
        src = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        dst = src + 1 + within
        x = hs[src] ^ hs[dst]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[src][keep], "b": ids[dst][keep], "hamming": ham[keep]})

    pairs = bucketed.groupby("bucket").map_groups(expand, batch_format="pandas")
    return _distinct_pairs(pairs, extra={"hamming": "hamming"})


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_pairs(emb_ds, emb_table: pa.Table, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold over an embedding column.

    Ray side: per-batch matmul against the broadcast (normalized)
    matrix — the brute-force baseline; the scale path buckets by an
    LSH of the embedding first (see functions/ann.py). Oracle:
    DuckDB list_cosine_similarity self-join.
    """
    import ray

    ids = emb_table.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = emb_table.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(ids), -1
    )
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        b_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bc = batch.column("embedding")
        if isinstance(bc, pa.ChunkedArray):
            bc = bc.combine_chunks()
        bm = np.asarray(bc.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            len(b_ids), -1
        )
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        bm = bm / bn[:, None]
        sims = bm @ m.T
        out_a, out_b = [], []
        for i in range(len(b_ids)):
            hits = np.flatnonzero((sims[i] >= threshold) & (all_ids > b_ids[i]))
            out_a += [int(b_ids[i])] * len(hits)
            out_b += [int(x) for x in all_ids[hits]]
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def embedding_near_pairs_lsh(
    emb_ds,
    threshold: float = 0.95,
    bits_per_band: int = 8,
    num_bands: int = 4,
    seed: int = 7,
):
    """Embedding-cosine near-dup at scale: random-hyperplane LSH
    bucketing + exact in-bucket verification — NO corpus broadcast
    (the scale path :func:`embedding_near_pairs`'s docstring promises;
    that brute-force kernel stays as the oracle twin).

    Each vector's sign signature splits into ``num_bands`` bands of
    ``bits_per_band`` hyperplanes; a vector ships once per band
    (bounded ×num_bands replication) keyed by its packed band bits,
    one hash shuffle groups collisions, and every bucket runs the
    exact normalized-gram test, so output pairs are exact-verified
    (⊆ brute force — no false positives). Recall is the standard LSH
    bound 1-(1-p^r)^b with p = 1-θ/π (≈0.97 for cos≥0.95 at the
    defaults); the pytest pins measured recall vs the brute-force
    kernel. Duplicate pairs from multi-band collisions collapse in a
    final (a, b) distinct aggregate.
    """
    from .ann import _list_matrix
    from ..util import splitmix64

    nbits = bits_per_band * num_bands
    rng = np.random.default_rng(seed)
    planes_by_dim: dict[int, np.ndarray] = {}

    def band_explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _list_matrix(batch.column("embedding"))
        if len(ids) == 0 or mat.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.uint64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding").slice(0, 0),
                }
            )
        dim = mat.shape[1]
        if dim not in planes_by_dim:  # deterministic per dim: same seed everywhere
            planes_by_dim[dim] = np.random.default_rng(seed).standard_normal((nbits, dim))
        planes = planes_by_dim[dim]
        bits = (mat @ planes.T) >= 0  # (n, nbits)
        parts_b, parts_i, parts_row = [], [], []
        weights = (np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64))
        for b in range(num_bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            packed = (seg.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
            # salt with the band index so band b's bucket space is disjoint
            key = splitmix64(packed + np.uint64(b) * np.uint64(0x9E3779B97F4A7C15))
            parts_b.append(key)
            parts_i.append(ids)
            parts_row.append(np.arange(len(ids)))
        rows = np.concatenate(parts_row)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(parts_b), pa.uint64()),
                "vec_id": pa.array(np.concatenate(parts_i), pa.int64()),
                "embedding": emb.take(pa.array(rows, pa.int64())),
            }
        )

    exploded = emb_ds.map_batches(band_explode, batch_format="pyarrow", zero_copy_batch=True)

    PAIRS = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64())])

    def per_bucket(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return PAIRS.empty_table()
        # a vector can enter one bucket through several bands only if
        # two of its bands pack to colliding salted keys (rare) — dedupe
        uniq, first = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            return PAIRS.empty_table()
        mat = _list_matrix(t.column("embedding"))[first]
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        mat = mat / n[:, None]
        sims = mat @ mat.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(uniq[ai], uniq[bi])
        b = np.maximum(uniq[ai], uniq[bi])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = exploded.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    # multi-band duplicates collapse in one distinct aggregate
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


# --------------------------------------------------------------------------
# distributed connected components (label propagation)
# --------------------------------------------------------------------------


def label_propagation_components(edges_ds, max_iters: int = 20, num_partitions: int = 32):
    """edges (a, b) → (node, label=component minimum), fully distributed.

    The scale path for cluster assignment when the verified near-dup
    edge list is too large to union-find on the driver (the stated
    assumption of :func:`minhash_dedup_assign`): iterative min-label
    propagation. Each round: every node takes the minimum label among
    itself and its neighbors — a label lookup keyed on edge sources,
    then a min-groupby per destination. Each round ends with a
    pointer-jumping shortcut (label ← label(label), one self-lookup),
    which turns plain propagation's O(diameter) rounds into
    O(log diameter) — a 2^20-node chain converges inside the default
    ``max_iters=20``. The loop stops early when a propagation round
    changes nothing (count of label changes is itself a distributed
    aggregate — no driver materialization of the label table), and
    RAISES if the budget is exhausted before convergence rather than
    returning silently-split components.

    All lookups use the tagged-union + hash-bucket groupby pattern
    (one exchange each) instead of ``Dataset.join``: Ray 2.49's native
    join crashes (Acero "No match … for key field") when a hash
    partition materializes from schema-less empty blocks, which any
    upstream ``map_groups`` with sparse groups produces — exactly the
    shape :mod:`..clustering` feeds this function.
    """
    from ray.data.aggregate import Min, Sum  # Min: round-0 label init

    from ..util import (
        effective_num_partitions,
        sever_lineage,
        splitmix64,
        tune_shuffle_context,
    )

    tune_shuffle_context()
    nparts = effective_num_partitions(num_partitions)

    WIRE = pa.schema(
        [
            pa.field("bucket", pa.int32()),
            pa.field("k", pa.int64()),
            pa.field("v", pa.int64()),
            pa.field("tag", pa.bool_()),
        ]
    )

    def _tag_stage(kcol: str, vcol: str, is_lookup: bool):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(kcol).to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch.column(vcol).to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
                np.int32
            )
            return pa.table(
                {
                    "bucket": pa.array(bucket, pa.int32()),
                    "k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "tag": pa.array(
                        np.full(len(k), is_lookup, dtype=bool), pa.bool_()
                    ),
                }
            ).cast(WIRE)

        return fn

    def _kv_lookup(left_ds, lk, lv, lookup_ds, rk, rv, fold, out_schema):
        """left rows (k, v) matched against unique-key lookup (k → lv);
        per bucket one sort + searchsorted; ``fold(k, v, looked_up)``
        builds the output rows (inner semantics: unmatched drop)."""
        left = left_ds.map_batches(
            _tag_stage(lk, lv, False), batch_format="pyarrow", zero_copy_batch=True
        )
        right = lookup_ds.map_batches(
            _tag_stage(rk, rv, True), batch_format="pyarrow", zero_copy_batch=True
        )

        def per_bucket(g: pa.Table) -> pa.Table:
            tag = g.column("tag").to_numpy(zero_copy_only=False)
            k = g.column("k").to_numpy(zero_copy_only=False)
            v = g.column("v").to_numpy(zero_copy_only=False)
            lkk, lvv = k[tag], v[tag]
            order = np.argsort(lkk)
            lkk, lvv = lkk[order], lvv[order]
            pk, pv = k[~tag], v[~tag]
            if len(lkk) == 0 or len(pk) == 0:
                return out_schema.empty_table()
            pos = np.searchsorted(lkk, pk)
            ok = (pos < len(lkk)) & (lkk[np.minimum(pos, len(lkk) - 1)] == pk)
            return fold(pk[ok], pv[ok], lvv[pos[ok]]).cast(out_schema)

        return left.union(right).groupby("bucket").map_groups(
            per_bucket, batch_format="pyarrow"
        )

    LBL = pa.schema([pa.field("node", pa.int64()), pa.field("label", pa.int64())])
    FOLDED = pa.schema(
        [
            pa.field("node", pa.int64()),
            pa.field("label", pa.int64()),
            pa.field("changed", pa.int64()),
        ]
    )

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = sever_lineage(
        edges_ds.map_batches(
            undirect, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    )
    # label(node) = min(node, min neighbor) — round 0 fused into the init
    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("src"),
                    "label": pa.array(
                        np.minimum(
                            t.column("src").to_numpy(zero_copy_only=False),
                            t.column("label").to_numpy(zero_copy_only=False),
                        ),
                        pa.int64(),
                    ),
                }
            ).cast(LBL),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    labels = sever_lineage(labels)
    for _ in range(max_iters):
        # propose + fold, FUSED to two exchanges (instead of lookup +
        # Min-groupby + lookup = three): exchange A keys edges by
        # hash(src) to attach src's label; its per-bucket fold emits
        # proposal rows ALREADY bucketed by hash(dst), so exchange B
        # can group proposals and old labels together — per bucket one
        # argsort of proposals gives the per-dst min (np.minimum.reduceat),
        # merged against the unique old-label rows in the same pass.
        proposals = _kv_lookup(
            edges,
            "src",
            "dst",
            labels,
            "node",
            "label",
            lambda k, v, lv: pa.table(
                {
                    "bucket": pa.array(
                        (splitmix64(v.view(np.uint64)) % np.uint64(nparts)).astype(
                            np.int32
                        ),
                        pa.int32(),
                    ),
                    "k": pa.array(v, pa.int64()),
                    "v": pa.array(lv, pa.int64()),
                    "tag": pa.array(np.zeros(len(v), dtype=bool), pa.bool_()),
                }
            ),
            WIRE,
        )
        lab_tagged = labels.map_batches(
            _tag_stage("node", "label", True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def fold_bucket(g: pa.Table) -> pa.Table:
            tag = g.column("tag").to_numpy(zero_copy_only=False)
            k = g.column("k").to_numpy(zero_copy_only=False)
            v = g.column("v").to_numpy(zero_copy_only=False)
            node, old = k[tag], v[tag]
            pk, pv = k[~tag], v[~tag]
            if len(node) == 0:
                return FOLDED.empty_table()
            if len(pk) == 0:
                # no proposals reached this bucket: labels unchanged
                return pa.table(
                    {
                        "node": pa.array(node, pa.int64()),
                        "label": pa.array(old, pa.int64()),
                        "changed": pa.array(
                            np.zeros(len(node), dtype=np.int64), pa.int64()
                        ),
                    }
                ).cast(FOLDED)
            order = np.argsort(pk, kind="stable")
            pk_s, pv_s = pk[order], pv[order]
            starts = np.flatnonzero(
                np.concatenate([[True], pk_s[1:] != pk_s[:-1]])
            )
            dst_u = pk_s[starts]
            nl_u = np.minimum.reduceat(pv_s, starts)
            # attach per-dst proposal min onto the old labels
            pos = np.searchsorted(dst_u, node)
            ok = (pos < len(dst_u)) & (dst_u[np.minimum(pos, len(dst_u) - 1)] == node)
            new = old.copy()
            new[ok] = np.minimum(old[ok], nl_u[pos[ok]])
            return pa.table(
                {
                    "node": pa.array(node, pa.int64()),
                    "label": pa.array(new, pa.int64()),
                    "changed": pa.array((new != old).astype(np.int64), pa.int64()),
                }
            ).cast(FOLDED)

        # sever_lineage on every loop-carried materialize: Ray keeps
        # the full logical plan behind a MaterializedDataset, so the
        # plan (and planning time) would double per round otherwise —
        # see ..util.sever_lineage
        folded = sever_lineage(
            proposals.union(lab_tagged)
            .groupby("bucket")
            .map_groups(fold_bucket, batch_format="pyarrow")
            .materialize()
        )
        changed = folded.aggregate(Sum("changed", alias_name="n"))["n"]
        # coalesce to nparts blocks: every union+groupby in this loop
        # emits as many blocks as it receives, so without this the
        # label block count (and task count) grows ~4x per round
        labels = sever_lineage(
            folded.select_columns(["node", "label"])
            .repartition(nparts)
            .materialize()
        )
        if not changed:
            # propagation fixed point: labels constant across every
            # edge, hence equal to the component minimum — converged
            return labels
        # pointer jumping: label ← min(label, label(label)). Every
        # label value is itself a node id present in `labels`, so the
        # inner self-lookup is total; this halves the distance to the
        # component minimum each round (O(log diameter) overall).
        labels = _kv_lookup(
            labels,
            "label",
            "node",
            labels,
            "node",
            "label",
            lambda k, v, lv: pa.table(
                {
                    "node": pa.array(v, pa.int64()),
                    "label": pa.array(np.minimum(k, lv), pa.int64()),
                }
            ),
            LBL,
        ).repartition(nparts).materialize()
        labels = sever_lineage(labels)
    last = locals().get("changed", "n/a (zero rounds ran)")
    raise RuntimeError(
        f"label_propagation_components did not converge in {max_iters} rounds "
        f"(last round changed {last} labels); component labels would be "
        "silently wrong — raise max_iters"
    )
