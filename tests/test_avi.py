"""MJPEG-AVI container tests (ops/avi.py) + the real video frame lane."""

from __future__ import annotations

import numpy as np
import pytest

from openair_spark.ops.avi import decode_mjpeg_avi, encode_mjpeg_avi, is_avi


def _frames(n=4, h=24, w=32, seed=0):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = np.stack([(128 + 60 * np.sin(xx / 5 + seed)).clip(0, 255),
                     (128 + 60 * np.cos(yy / 4)).clip(0, 255),
                     (128 + 50 * np.sin((xx + yy) / 7)).clip(0, 255)],
                    axis=-1).astype(np.uint8)
    return [np.roll(base, 3 * i, axis=1) for i in range(n)]


def test_roundtrip_frames_and_fps():
    frames = _frames(5)
    data = encode_mjpeg_avi(frames, fps=12, quality=95)
    assert is_avi(data)
    got, fps = decode_mjpeg_avi(data)
    assert fps == 12 and len(got) == 5
    for f, g in zip(frames, got):
        assert g.shape == f.shape
        assert np.abs(g.astype(int) - f.astype(int)).mean() < 6.0


def test_error_gating():
    with pytest.raises(ValueError):
        decode_mjpeg_avi(b"RIFFxxxxWAVEfmt ")   # RIFF but not AVI
    data = bytearray(encode_mjpeg_avi(_frames(2), fps=10))
    with pytest.raises(ValueError):             # truncated container
        decode_mjpeg_avi(bytes(data[:60]))
    with pytest.raises(NotImplementedError):    # non-JPEG stream payload
        idx = bytes(data).find(b"00dc") + 8
        data[idx:idx + 3] = b"\x00\x00\x00"
        decode_mjpeg_avi(bytes(data))


def test_frame_sample_real_video_lane(spark):
    """synth_avi_assets emits real MJPEG AVIs; frame_sample(fake=False)
    must decode evenly spaced frames whose mean luma matches the
    PRE-compression source frames (independent truth)."""
    from openair_spark.ops.multimodal import (
        frame_sample,
        synth_avi_assets,
        synth_avi_clip,
    )
    from openair_spark.spark.corpus import pages_df

    assets = synth_avi_assets(pages_df(spark, 8, "mm-avi"), n_frames=4).cache()
    rows = assets.select("url", "asset_id", "meta").collect()
    assert len(rows) == 8
    for r in rows:
        assert r["meta"]["content_type"] == "video/x-msvideo"
    out = frame_sample(assets, n_frames=3, fake=False).collect()
    by_asset: dict = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {r["asset_id"] for r in rows}
    for r in rows:
        frames = synth_avi_clip(r["url"], 4)
        sampled = sorted(by_asset[r["asset_id"]], key=lambda x: x["frame_idx"])
        assert [s["frame_idx"] for s in sampled] == [0, 1, 2]
        # picks for n_frames=3 over 4 source frames: indices 0, 1, 3
        for s, fi in zip(sampled, [0, 1, 3]):
            src = frames[fi].astype(np.float64)
            luma = (0.299 * src[..., 0] + 0.587 * src[..., 1]
                    + 0.114 * src[..., 2])
            assert s["mean_luma"] == pytest.approx(float(luma.mean()), abs=3.0)
    assets.unpersist()


def test_frame_sample_stub_keeps_plumbing(spark):
    from openair_spark.ops.multimodal import extract_assets, frame_sample
    from openair_spark.spark.corpus import pages_df

    assets = extract_assets(pages_df(spark, 5, "mm-avi2"))
    out = frame_sample(assets, n_frames=2, fake=True).collect()
    assert len(out) == 10
    assert all(r["mean_luma"] is None for r in out)
    with pytest.raises(Exception) as exc:
        frame_sample(assets, n_frames=2, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)
