"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/feature kernels are STUBS behind import-tries — the
image/audio libraries are not in this container — but the Ray-side
plumbing (schema, actor-pool stage signature, batch sizing, output
layout) is real and tested. A deterministic fake decoder stands in so
the pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash64_str, splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("media_type", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),  # opaque encoded bytes
        pa.field("n_bytes", pa.int64()),
    ]
)

try:  # pragma: no cover — not installed here
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def media_spans_table(docs_batch: pa.Table) -> pa.Table:
    """documents batch → media rows (one per media span).

    The payload is a deterministic fake (hash-derived bytes) standing
    in for the fetched object; media_type is derived from the ref.
    """
    from ..spans import explode_spans
    import pyarrow.compute as pc

    spans = explode_spans(docs_batch)
    media = spans.filter(pc.equal(spans.column("kind"), "media"))
    refs = media.column("media_ref").to_pylist()
    types, payloads, sizes = [], [], []
    ref_hashes = hash64_str(refs) if refs else np.array([], dtype=np.uint64)
    for i, r in enumerate(refs):
        h = splitmix64(ref_hashes[i])  # stable across processes (not hash())
        t = ["image", "audio", "video"][int(h) % 3]
        size = 64 + int(h) % 192
        payloads.append(bytes((int(splitmix64(np.uint64(int(h) + i))) & 0xFF) for i in range(size)))
        types.append(t)
        sizes.append(size)
    return pa.table(
        {
            "media_ref": media.column("media_ref"),
            "doc_id": media.column("doc_id"),
            "span_idx": media.column("span_idx"),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array(sizes, pa.int64()),
        }
    ).cast(MEDIA_SCHEMA)


class MediaFeatureActor:
    """Actor-pool map_batches callable: decode + feature-extract media.

    Real decode requires PIL/ffmpeg (absent) → NotImplementedError on
    the real path; the deterministic fake path computes byte-level
    stats so plumbing is testable. Small batch sizes are the point:
    large binary payloads × concurrency must fit worker heaps.
    """

    def __init__(self, use_real_decoder: bool = False):
        if use_real_decoder and not HAVE_PIL:
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg — not available in this container"
            )
        self.use_real = use_real_decoder and HAVE_PIL

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means, entropies = [], []
        for p in payloads:
            arr = np.frombuffer(p or b"\x00", dtype=np.uint8)
            means.append(float(arr.mean()))
            counts = np.bincount(arr, minlength=256) / len(arr)
            nz = counts[counts > 0]
            entropies.append(float(-(nz * np.log2(nz)).sum()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("byte_mean", pa.array(means, pa.float64()))
        return out.append_column("byte_entropy", pa.array(entropies, pa.float64()))


def media_features(docs_ds, concurrency: int = 2, batch_size: int = 256):
    """documents → media feature table (actor-pool stage; small batches
    on purpose for binary payloads)."""
    media = docs_ds.map_batches(media_spans_table, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
