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
    n = len(refs)
    ref_hashes = hash64_str(refs) if refs else np.array([], dtype=np.uint64)
    h = splitmix64(ref_hashes)  # stable across processes (not hash())
    kinds = np.array(["image", "audio", "video"])[(h % np.uint64(3)).astype(np.int64)]
    sizes = (np.uint64(64) + h % np.uint64(192)).astype(np.int64)
    # one splitmix sweep over (hash + byte index) builds every payload
    total = int(sizes.sum())
    starts = np.cumsum(sizes) - sizes
    row_of = np.repeat(np.arange(n, dtype=np.int64), sizes)
    within = np.arange(total, dtype=np.uint64) - np.repeat(starts, sizes).astype(np.uint64)
    with np.errstate(over="ignore"):
        flat = (splitmix64(h[row_of] + within) & np.uint64(0xFF)).astype(np.uint8)
    offs64 = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(sizes)])
    if offs64[-1] >= 2**31:
        # from_buffers performs no validation — a wrapped int32 offset
        # would build a structurally invalid binary column silently
        raise ValueError(
            f"media batch payload totals {offs64[-1]} bytes (>= 2^31); "
            "lower the batch size so per-batch payloads fit 32-bit offsets"
        )
    offs = offs64.astype(np.int32)
    payload = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())]
    )
    return pa.table(
        {
            "media_ref": media.column("media_ref"),
            "doc_id": media.column("doc_id"),
            "span_idx": media.column("span_idx"),
            "media_type": pa.array(kinds, pa.string()),
            "payload": payload,
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


class MediaResizeActor:
    """Actor-pool resize stage: image payloads → fixed-size thumbnails.

    Real path (PIL decode → resize → re-encode) is gated on the
    library and raises NotImplementedError here; the deterministic
    fake path treats the payload as a row-major uint8 grid whose
    shape derives from its length, and area-averages it down to
    ``(out_h, out_w)`` with one numpy reduce — so batch sizing,
    schema evolution (payload replaced, width/height appended) and
    actor reuse are all exercised for real. Non-image rows pass
    through untouched with null dims.
    """

    def __init__(self, out_w: int = 8, out_h: int = 8, use_real_decoder: bool = False):
        if use_real_decoder and not HAVE_PIL:
            raise NotImplementedError(
                "real image resize needs PIL — not available in this container"
            )
        self.use_real = use_real_decoder and HAVE_PIL
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_payloads, widths, heights = [], [], []
        for t, p in zip(types, payloads):
            if t != "image" or not p:
                out_payloads.append(p)
                widths.append(None)
                heights.append(None)
                continue
            arr = np.frombuffer(p, dtype=np.uint8)
            # fake "decode": squarest grid that fits the byte length
            w = max(1, int(np.sqrt(len(arr))))
            h = len(arr) // w
            grid = arr[: h * w].reshape(h, w).astype(np.float64)
            # area-average down (pad up to a multiple first)
            oh, ow = min(self.out_h, h), min(self.out_w, w)
            ys = (np.arange(h) * oh // h)
            xs = (np.arange(w) * ow // w)
            small = np.zeros((oh, ow))
            cnt = np.zeros((oh, ow))
            np.add.at(small, (ys[:, None], xs[None, :]), grid)
            np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
            thumb = (small / np.maximum(cnt, 1.0)).astype(np.uint8)
            out_payloads.append(thumb.tobytes())
            widths.append(ow)
            heights.append(oh)
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload", pa.array(out_payloads, pa.binary()))
        out = out.append_column("thumb_w", pa.array(widths, pa.int32()))
        return out.append_column("thumb_h", pa.array(heights, pa.int32()))


FRAME_BYTES = 32  # fake fixed frame stride inside a video payload


class FrameSampleActor:
    """Actor-pool frame-sampling stage: video payloads → one row per
    sampled frame (an in-batch explode — output rows ≠ input rows).

    Real path (ffmpeg keyframe extraction) is library-gated; the fake
    path treats the payload as fixed-stride frames and emits every
    ``step``-th one with its frame index and a synthetic timestamp —
    the explode layout (list offsets → take) is the real planet-scale
    shape. Non-video rows are dropped (this stage's contract is a
    frames table, not a passthrough).
    """

    def __init__(self, step: int = 2, fps: float = 30.0, use_real_decoder: bool = False):
        if use_real_decoder:
            raise NotImplementedError(
                "real frame extraction needs ffmpeg — not available in this container"
            )
        self.step = max(1, step)
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch.column("media_type"), "video"))
        refs = vids.column("media_ref").to_pylist()
        payloads = vids.column("payload").to_pylist()
        out_ref, out_idx, out_ts, out_frame = [], [], [], []
        for r, p in zip(refs, payloads):
            if not p:
                continue
            n_frames = max(1, len(p) // FRAME_BYTES)
            for fi in range(0, n_frames, self.step):
                out_ref.append(r)
                out_idx.append(fi)
                out_ts.append(fi / self.fps)
                out_frame.append(p[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES])
        return pa.table(
            {
                "media_ref": pa.array(out_ref, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_s": pa.array(out_ts, pa.float64()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def media_thumbnails(docs_ds, out_w: int = 8, out_h: int = 8, concurrency: int = 2,
                     batch_size: int = 256):
    """documents → media rows with image payloads resized (actor pool)."""
    media = docs_ds.map_batches(media_spans_table, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def video_frames(docs_ds, step: int = 2, concurrency: int = 2, batch_size: int = 256):
    """documents → sampled video frames table (actor pool explode)."""
    media = docs_ds.map_batches(media_spans_table, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"step": step},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
