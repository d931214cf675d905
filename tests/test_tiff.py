"""Baseline TIFF codec tests (ops/tiff.py) — lossless, exact roundtrips.

TIFF-LZW's MSB packing + EarlyChange is pinned by a hand-packed
bitstream; big-endian, white-is-zero, palette, and multi-strip layouts
are exercised via hand-built files the encoder never emits."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.tiff import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
def test_roundtrip_all_compressions(comp):
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (5, 7), (9, 13, 3), (6, 4, 4), (40, 33, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_tiff(img, comp)
        assert is_tiff(data)
        out = decode_tiff(data)
        ref = img if img.ndim == 3 else img[:, :, None]
        assert (out == ref).all(), (comp, shape)


def test_lzw_dictionary_growth_and_clear():
    """Compressible stream crossing every width transition and the
    4094-entry CLEAR reset must roundtrip exactly."""
    blob = (b"abcabd" * 60000)
    assert tiff_lzw_decode(tiff_lzw_encode(blob), len(blob)) == blob
    rng = np.random.default_rng(2)
    blob = rng.integers(0, 256, 200_000).astype(np.uint8).tobytes()
    assert tiff_lzw_decode(tiff_lzw_encode(blob), len(blob)) == blob


def test_hand_packed_tiff_lzw_bitstream():
    """Hand-derived MSB-first stream: CLEAR(256), 'A'(65), 'B'(66),
    EOI(257) at 9 bits each = 36 bits:
    100000000 001000001 001000010 100000001 + 4 pad zeros
    -> bytes 0x80 0x10 0x48 0x50 0x10."""
    data = bytes([0x80, 0x10, 0x48, 0x50, 0x10])
    assert tiff_lzw_decode(data, 2) == b"AB"


def test_packbits_spec_cases():
    # literal, repeat, and the 0x80 no-op
    assert packbits_decode(bytes([0x02, 1, 2, 3]), 10) == bytes([1, 2, 3])
    assert packbits_decode(bytes([0xFE, 7]), 10) == bytes([7, 7, 7])
    assert packbits_decode(bytes([0x80, 0x00, 9]), 10) == bytes([9])
    with pytest.raises(ValueError):
        packbits_decode(bytes([0x05, 1]), 10)       # literal overrun


def _ifd(end, entries, strip, extra=b""):
    """Build a minimal single-IFD TIFF with the given (tag, typ, cnt,
    value) entries; value arrays > 4 bytes land after the IFD."""
    magic = b"II*\x00" if end == "<" else b"MM\x00*"
    n = len(entries)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    blobs = {}
    blob_data = bytearray()
    for tag, typ, cnt, val in entries:
        if isinstance(val, (list, tuple)):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt > 4:
                blobs[tag] = extra_off + len(blob_data)
                blob_data += struct.pack(end + ("H" if typ == 3 else "I") * cnt, *val)
    data_off = extra_off + len(blob_data)
    out = bytearray(magic + struct.pack(end + "I", ifd_off))
    out += struct.pack(end + "H", n)
    for tag, typ, cnt, val in sorted(entries):
        if isinstance(val, (list, tuple)):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt <= 4:
                packed = struct.pack(end + ("H" if typ == 3 else "I") * cnt, *val)
                packed += b"\x00" * (4 - len(packed))
                out += struct.pack(end + "HHI", tag, typ, cnt) + packed
            else:
                out += struct.pack(end + "HHII", tag, typ, cnt, blobs[tag])
        else:
            if val == "STRIP":
                val = data_off
            if typ == 3:
                out += struct.pack(end + "HHI", tag, typ, cnt)
                out += struct.pack(end + "H", val) + b"\x00\x00"
            else:
                out += struct.pack(end + "HHII", tag, typ, cnt, val)
    out += struct.pack(end + "I", 0)
    out += blob_data + strip
    return bytes(out)


def test_big_endian_and_white_is_zero():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    data = _ifd(">", [
        (256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0),                      # white-is-zero
        (273, 4, 1, "STRIP"), (277, 3, 1, 1), (278, 3, 1, 3),
        (279, 4, 1, 12)], g.tobytes())
    out = decode_tiff(data)
    assert (out[:, :, 0] == 255 - g).all()


def test_palette_tiff():
    pal16 = [[i * 257 for i in (250, 0, 0)], [i * 257 for i in (0, 250, 0)],
             [i * 257 for i in (0, 0, 250)]]
    cmap = [0] * (3 * 256)
    for ci, rgb in enumerate(pal16):
        for comp_i in range(3):
            cmap[comp_i * 256 + ci] = rgb[comp_i]
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    data = _ifd("<", [
        (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, "STRIP"), (277, 3, 1, 1),
        (278, 3, 1, 2), (279, 4, 1, 6), (320, 3, 3 * 256, cmap)],
        idx.tobytes())
    out = decode_tiff(data)
    pal8 = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    assert (out == pal8[idx]).all()


def test_multi_strip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    # two strips of 3 rows each, uncompressed
    s1, s2 = img[:3].tobytes(), img[3:].tobytes()
    n = 10
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4 + 16   # +16 for two offset arrays
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    arr_off = ifd_off + 2 + 12 * n + 4
    entries = [
        (256, 3, 1, 5), (257, 3, 1, 6), (258, 3, 3, [8, 8, 8]),
        (259, 3, 1, 1), (262, 3, 1, 2),
        (273, 4, 2, [data_off, data_off + len(s1)]),
        (277, 3, 1, 3), (278, 3, 1, 3),
        (279, 4, 2, [len(s1), len(s2)]),
        (296, 3, 1, 2)]
    blobs = bytearray()
    blob_pos = {}
    for tag, typ, cnt, val in entries:
        if isinstance(val, list):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt > 4:
                blob_pos[tag] = arr_off + len(blobs)
                blobs += struct.pack("<" + ("H" if typ == 3 else "I") * cnt, *val)
    assert len(blobs) == 16 + 6  # 2x2 longs + 3 shorts
    # recompute data_off with actual blob size
    data_off = arr_off + len(blobs)
    entries[5] = (273, 4, 2, [data_off, data_off + len(s1)])
    blobs = bytearray(); blob_pos = {}
    for tag, typ, cnt, val in entries:
        if isinstance(val, list):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt > 4:
                blob_pos[tag] = arr_off + len(blobs)
                blobs += struct.pack("<" + ("H" if typ == 3 else "I") * cnt, *val)
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in sorted(entries):
        if isinstance(val, list):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt <= 4:
                packed = struct.pack("<" + ("H" if typ == 3 else "I") * cnt, *val)
                packed += b"\x00" * (4 - len(packed))
                out += struct.pack("<HHI", tag, typ, cnt) + packed
            else:
                out += struct.pack("<HHII", tag, typ, cnt, blob_pos[tag])
        else:
            if typ == 3:
                out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += blobs + s1 + s2
    got = decode_tiff(bytes(out))
    assert (got == img).all()


def test_error_gating():
    good = encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8), "lzw")
    with pytest.raises(ValueError):
        decode_tiff(b"PNG not a tiff..")
    with pytest.raises(ValueError):
        decode_tiff(good[:-10])
    with pytest.raises(NotImplementedError):   # 16-bit samples
        bad = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
        idx = bytes(bad).find(struct.pack("<HHI", 258, 3, 1))
        struct.pack_into("<H", bad, idx + 8, 16)
        decode_tiff(bytes(bad))
    with pytest.raises(NotImplementedError):   # CCITT compression
        bad = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
        idx = bytes(bad).find(struct.pack("<HHI", 259, 3, 1))
        struct.pack_into("<H", bad, idx + 8, 2)
        decode_tiff(bytes(bad))
