"""Multimodal stage tests (resize / frame-sample plumbing)."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_media_thumbnails_deterministic_and_schema():
    import ray.data as rd

    from ingest_ray.functions.multimodal import media_thumbnails
    from ingest_ray.synth import synth_documents

    docs = rd.from_arrow(synth_documents(3000))
    rows = media_thumbnails(docs, out_w=4, out_h=4).take_all()
    assert len(rows) > 0
    imgs = [r for r in rows if r["media_type"] == "image"]
    others = [r for r in rows if r["media_type"] != "image"]
    assert imgs and others
    for r in imgs:
        assert r["thumb_w"] == 4 and r["thumb_h"] == 4
        assert len(r["payload"]) == 16  # 4x4 uint8 thumbnail
    for r in others:  # non-images pass through untouched
        assert r["thumb_w"] is None and len(r["payload"]) == r["n_bytes"]
    # deterministic across runs
    again = media_thumbnails(docs, out_w=4, out_h=4).take_all()
    key = lambda r: (r["media_ref"], r["span_idx"])
    assert sorted((key(r), bytes(r["payload"])) for r in rows) == sorted(
        (key(r), bytes(r["payload"])) for r in again
    )


@pytest.mark.usefixtures("ray_session")
def test_video_frames_sampling():
    import ray.data as rd

    from ingest_ray.functions.multimodal import (
        FRAME_BYTES,
        media_spans_table,
        video_frames,
    )
    from ingest_ray.synth import synth_documents

    docs_tbl = synth_documents(3000)
    docs = rd.from_arrow(docs_tbl)
    media = media_spans_table(docs_tbl)
    vids = {
        r["media_ref"]: r["payload"].as_py() if hasattr(r["payload"], "as_py") else r["payload"]
        for r in media.to_pylist()
        if r["media_type"] == "video"
    }
    assert vids
    frames = video_frames(docs, step=2).take_all()
    by_ref: dict = {}
    for f in frames:
        by_ref.setdefault(f["media_ref"], []).append(f)
    assert set(by_ref) == set(vids)
    for ref, fs in by_ref.items():
        p = vids[ref]
        n_frames = max(1, len(p) // FRAME_BYTES)
        want_idx = list(range(0, n_frames, 2))
        got = sorted(fs, key=lambda f: f["frame_idx"])
        assert [f["frame_idx"] for f in got] == want_idx
        for f in got:
            fi = f["frame_idx"]
            assert bytes(f["frame"]) == p[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
            assert abs(f["ts_s"] - fi / 30.0) < 1e-12


def test_real_decoder_paths_gated():
    from ingest_ray.functions.multimodal import (
        HAVE_PIL,
        FrameSampleActor,
        MediaResizeActor,
    )

    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            MediaResizeActor(use_real_decoder=True)
    with pytest.raises(NotImplementedError):
        FrameSampleActor(use_real_decoder=True)
