"""From-scratch GIF codec tests (ops/gif.py).

GIF is lossless over an exact palette, so roundtrips assert EXACT
pixel equality. The LZW layer is additionally pinned by a HAND-PACKED
bitstream (codes and variable-width LSB-first packing derived by hand
from the spec) so an encoder/decoder typo cannot cancel.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.gif import (
    decode_gif,
    encode_gif,
    is_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_all_widths():
    rng = np.random.default_rng(0)
    for mcs in (2, 3, 4, 6, 8):
        idx = rng.integers(0, 1 << mcs, 6000).astype(np.uint8)
        assert (lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)) == idx).all()
    # dictionary-overflow path: > 4096 entries forces a mid-stream CLEAR
    idx = rng.integers(0, 4, 60_000).astype(np.uint8)
    assert (lzw_decode(lzw_encode(idx, 2), 2, len(idx)) == idx).all()


def test_hand_packed_lzw_bitstream():
    """min_code_size=2 (clear=4, eoi=5), pixels [1,1,2]:
    codes (4,w3)(1,w3)(1,w3)(2,w4)(5,w4) — width grows to 4 after the
    dictionary reaches 8 entries. LSB-first packing by hand:
    4|1<<3|1<<6 = 76 = 0x4C, then 2<<1|5<<5 = 164 = 0xA4, final
    carry byte 0x00."""
    assert (lzw_decode(bytes([0x4C, 0xA4, 0x00]), 2, 3)
            == np.array([1, 1, 2], dtype=np.uint8)).all()


def test_hand_built_gif_file():
    """Complete hand-assembled GIF89a: 3x1 screen, 4-color global
    table, the hand-packed stream above -> pixels red, red, green."""
    data = (b"GIF89a"
            + struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)
            + bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
            + bytes([2])                        # LZW min code size
            + bytes([3, 0x4C, 0xA4, 0x00, 0])   # one sub-block + terminator
            + b"\x3B")
    frames, _ = decode_gif(data)
    assert frames[0].shape == (1, 3, 4)
    assert (frames[0][0, 0, :3] == [255, 0, 0]).all()
    assert (frames[0][0, 1, :3] == [255, 0, 0]).all()
    assert (frames[0][0, 2, :3] == [0, 255, 0]).all()


def test_single_frame_exact_roundtrip():
    img = np.zeros((20, 30, 3), dtype=np.uint8)
    img[5:15, 10:20] = [200, 30, 40]
    img[0:3, :] = [0, 0, 255]
    data = encode_gif(img)
    assert is_gif(data)
    frames, _ = decode_gif(data)
    assert len(frames) == 1 and (frames[0][:, :, :3] == img).all()


def test_animation_exact_roundtrip_with_delays():
    fr = []
    for i in range(4):
        f = np.zeros((16, 16, 3), dtype=np.uint8)
        f[:, (i * 4):(i * 4 + 4)] = [10 * (i + 1), 250, 100]
        fr.append(f)
    frames, delays = decode_gif(encode_gif(fr, delays=[5, 6, 7, 8]))
    assert len(frames) == 4 and delays == [5, 6, 7, 8]
    for a, b in zip(frames, fr):
        assert (a[:, :, :3] == b).all()


def test_interlaced_image_decodes():
    """Hand-interlace a 8x4 image's rows (pass order 0,8.. / 4 / 2,6 /
    odd) and set the interlace flag; decode must restore row order."""
    img = np.arange(8 * 4, dtype=np.uint8).reshape(8, 4) % 4
    pal = np.array([[0, 0, 0], [80, 0, 0], [0, 80, 0], [0, 0, 80]],
                   dtype=np.uint8)
    pass_rows = [0] + [4] + [2, 6] + [1, 3, 5, 7]
    produced = img[pass_rows].ravel()
    stream = lzw_encode(produced, 2)
    data = (b"GIF89a" + struct.pack("<HHBBB", 4, 8, 0x81, 0, 0)
            + pal.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 8, 0x40)
            + bytes([2]))
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        data += bytes([len(chunk)]) + chunk
    data += b"\x00\x3B"
    frames, _ = decode_gif(data)
    assert (frames[0][:, :, :3] == pal[img]).all()


def test_transparency_and_disposal():
    """Frame 2 has a transparent region: the composited frame must
    show frame 1's pixels through it."""
    f1 = np.full((4, 4, 3), [10, 20, 30], dtype=np.uint8)
    f2 = np.zeros((4, 4, 3), dtype=np.uint8)
    f2[:2] = [200, 0, 0]
    # build manually: palette [bg, f1color, red]; frame2 uses index 0
    # as transparent for its lower half
    pal = np.array([[0, 0, 0], [10, 20, 30], [200, 0, 0]], dtype=np.uint8)
    idx1 = np.full((4, 4), 1, dtype=np.uint8)
    idx2 = np.zeros((4, 4), dtype=np.uint8)
    idx2[:2] = 2
    data = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 0, 0)
            + np.vstack([pal, [[0, 0, 0]]]).astype(np.uint8).tobytes())
    for idx, trans in [(idx1, None), (idx2, 0)]:
        if trans is not None:
            data += b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 10, trans) + b"\x00"
        data += b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 4, 0) + bytes([2])
        stream = lzw_encode(idx.ravel(), 2)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            data += bytes([len(chunk)]) + chunk
        data += b"\x00"
    data += b"\x3B"
    frames, _ = decode_gif(data)
    assert (frames[1][:2, :, :3] == [200, 0, 0]).all()
    assert (frames[1][2:, :, :3] == [10, 20, 30]).all()  # shows through


def test_error_gating():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"JIF89a not a gif")
    with pytest.raises(ValueError):   # truncated stream
        decode_gif(good[:20])
    with pytest.raises(ValueError):   # >256 colors for the exact encoder
        rng = np.random.default_rng(1)
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_frame_sample_real_gif_lane(spark):
    """synth_gif_assets emits real animated GIFs; frame_sample must
    decode frames whose luma EXACTLY matches the source clip (GIF is
    lossless over the exact palette)."""
    from openair_spark.ops.multimodal import (
        frame_sample,
        synth_gif_assets,
        synth_gif_clip,
    )
    from openair_spark.spark.corpus import pages_df

    assets = synth_gif_assets(pages_df(spark, 8, "mm-gif"), n_frames=3).cache()
    rows = assets.select("url", "asset_id", "meta").collect()
    for r in rows:
        assert r["meta"]["content_type"] == "image/gif"
    out = frame_sample(assets, n_frames=3, fake=False).collect()
    by_asset: dict = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for r in rows:
        clip = synth_gif_clip(r["url"], 3)
        sampled = sorted(by_asset[r["asset_id"]], key=lambda x: x["frame_idx"])
        assert len(sampled) == 3
        for s, src in zip(sampled, clip):
            f = src.astype(np.float64)
            luma = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])
            assert s["mean_luma"] == pytest.approx(float(luma.mean()), abs=1e-9)
    assets.unpersist()
