"""BMP codec tests (ops/bmp.py) — lossless, so roundtrips are exact."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.bmp import decode_bmp, encode_bmp, is_bmp


def test_rgb_roundtrip_exact_with_stride_padding():
    rng = np.random.default_rng(0)
    for w in (1, 2, 3, 4, 5, 17):       # exercise every row-padding case
        img = rng.integers(0, 256, (7, w, 3), dtype=np.uint8)
        data = encode_bmp(img)
        assert is_bmp(data)
        assert (decode_bmp(data) == img).all(), w


def test_gray_input_and_topdown():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    out = decode_bmp(encode_bmp(g))
    assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()
    # hand-build a top-down (negative height) 24-bit file
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    rows = np.zeros((2, 8), dtype=np.uint8)
    rows[:, :6] = img[:, :, ::-1].reshape(2, 6)   # natural order, BGR
    payload = rows.tobytes()
    data = (struct.pack("<2sIHHI", b"BM", 54 + len(payload), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0,
                          len(payload), 0, 0, 0, 0) + payload)
    assert (decode_bmp(data) == img).all()


def test_8bit_paletted():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    stride = 4
    rows = np.zeros((2, stride), dtype=np.uint8)
    rows[:, :3] = idx[::-1]                       # bottom-up
    quads = np.zeros((4, 4), dtype=np.uint8)
    quads[:, :3] = pal[:, ::-1]                   # BGRA palette
    payload = rows.tobytes()
    pix_off = 14 + 40 + 16
    data = (struct.pack("<2sIHHI", b"BM", pix_off + len(payload), 0, 0, pix_off)
            + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0,
                          len(payload), 0, 0, 4, 0) + quads.tobytes() + payload)
    assert (decode_bmp(data) == pal[idx]).all()


def test_error_gating():
    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(b"PM not a bitmap")
    with pytest.raises(ValueError):       # truncated pixels
        decode_bmp(good[:-8])
    with pytest.raises(NotImplementedError):  # RLE compression flag
        bad = bytearray(good)
        struct.pack_into("<I", bad, 30, 1)
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError):       # hostile dimensions
        bad = bytearray(good)
        struct.pack_into("<ii", bad, 18, 1 << 20, 1 << 20)
        decode_bmp(bytes(bad))


def test_bmp_through_decode_features(spark):
    """A BMP payload flows through the real decode path with exact
    pixel stats (BMP is lossless)."""
    import hashlib

    from openair_spark.ops.multimodal import decode_features

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    assets = spark.createDataFrame(
        [("b1", "bmp", bytearray(payload))],
        "asset_id string, kind string, payload binary")
    row = decode_features(assets, fake=False).collect()[0]
    luma = (0.299 * img[:, :, 0].astype(float)
            + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
    assert (row["height"], row["width"]) == (9, 13)
    assert abs(row["mean_luma"] - float(luma.mean())) < 1e-9
