"""ICO (favicon) container tests (ops/ico.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.bmp import encode_bmp
from openair_spark.ops.ico import decode_ico, encode_ico, is_ico


def test_png_entries_roundtrip_largest_first():
    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_ico([small, big])
    assert is_ico(data)
    frames = decode_ico(data)
    assert len(frames) == 2
    assert frames[0].shape == (32, 32, 4) and (frames[0][:, :, :3] == big).all()
    assert frames[1].shape == (16, 16, 4) and (frames[1][:, :, :3] == small).all()


def test_dib_entry_with_and_mask():
    """Hand-built classic DIB entry (24-bit XOR + 1-bit AND mask):
    masked pixels must come out transparent."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:] = [10, 200, 30]
    bmp = encode_bmp(img)                    # reuse for the pixel block
    hdr = bmp[14:54]                         # BITMAPINFOHEADER
    pixels = bmp[54:]
    dib = bytearray(hdr)
    struct.pack_into("<i", dib, 8, 8)        # doubled height
    mask_rows = bytearray()
    # AND mask: top row (in image space) transparent -> in bottom-up
    # mask the LAST row written is image row 0
    for y in range(4):                       # bottom-up rows 3..0
        row = 0b11110000_00000000_00000000_00000000 if y == 3 else 0
        mask_rows += struct.pack(">I", row)  # big-endian bit order
    payload = bytes(dib) + pixels + bytes(mask_rows)
    data = struct.pack("<HHH", 0, 1, 1)
    data += struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 24, len(payload), 22)
    data += payload
    frames = decode_ico(data)
    f = frames[0]
    assert f.shape == (4, 4, 4)
    assert (f[:, :, :3] == [10, 200, 30]).all()
    assert (f[0, :, 3] == 0).all()           # masked top row transparent
    assert (f[1:, :, 3] == 255).all()


def test_error_gating():
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x02\x00\x01\x00")  # cursor, not icon
    good = encode_ico([np.zeros((8, 8, 3), dtype=np.uint8)])
    with pytest.raises(ValueError):
        decode_ico(good[:-12])


def test_ico_and_gzip_through_decode_features(spark):
    """A favicon payload and a GZIP-WRAPPED PNG payload both flow
    through the real decode path (the gzip unwrap mirrors WARC record
    payloads) with exact pixel stats."""
    import gzip
    import hashlib

    from openair_spark.ops.multimodal import decode_features
    from openair_spark.ops.png import encode_png

    rng = np.random.default_rng(6)
    img1 = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [("i1", "ico", bytearray(encode_ico([img1]))),
         ("g1", "gz-png", bytearray(gzip.compress(encode_png(img2))))],
        "asset_id string, kind string, payload binary")
    rows = {r["asset_id"]: r for r in
            decode_features(assets, fake=False).collect()}
    for aid, img in [("i1", img1), ("g1", img2)]:
        luma = (0.299 * img[:, :, 0].astype(float)
                + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
        r = rows[aid]
        assert (r["height"], r["width"]) == img.shape[:2], aid
        assert abs(r["mean_luma"] - float(luma.mean())) < 1e-9, aid
