"""From-scratch WebP-lossless (VP8L) codec tests (ops/webp.py).

Lossless, so encoder<->decoder roundtrips assert EXACT equality.
Decoder-only features the literal-only encoder never emits —
transforms, color cache, LZ77 refs, palette packing — are exercised by
HAND-BUILT spec-conform streams assembled in this file.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.webp import (
    _BitWriter,
    _canonical_codes,
    _write_prefix_code,
    decode_webp,
    encode_webp,
    is_webp,
)


def _wrap(payload_bits: bytes) -> bytes:
    payload = b"\x2F" + payload_bits
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)   # alpha hint
    bw.write(0, 3)   # version


def _put_sym(bw: _BitWriter, codebook, sym: int) -> None:
    if len(codebook) == 1:
        return
    code, ln = codebook[int(sym)]
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _emit_literal_image(bw: _BitWriter, argb: np.ndarray,
                        extra_green: list[int] | None = None,
                        cache_bits: int = 0, top: bool = True) -> dict:
    """Write the spatial-image section (no meta codes) for (n, 4) ARGB
    literals; `extra_green` adds symbols (e.g. length prefixes / cache
    indices) to the green alphabet so hand tests can append refs.
    Sub-resolution images (top=False) carry NO meta-prefix bit per
    spec. Returns the per-channel codebooks."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if top:
        bw.write(0, 1)   # no meta prefix codes
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gsyms = list(argb[:, 2]) + (extra_green or [])
    books = []
    for vals, size in [(gsyms, green_alpha), (argb[:, 1], 256),
                       (argb[:, 3], 256), (argb[:, 0], 256), ([0], 40)]:
        hist = np.bincount(np.asarray(vals, dtype=np.int64), minlength=size)
        # flat code: every used symbol at depth ceil(log2(n)). Kraft sum
        # <= 1, and only codes we actually wrote are ever read, so an
        # incomplete code space is fine.
        used = np.nonzero(hist)[0]
        lengths = [0] * size
        if len(used) == 1:
            lengths[int(used[0])] = 1
        else:
            depth = int(np.ceil(np.log2(len(used))))
            for s in used:
                lengths[int(s)] = depth
        _write_prefix_code(bw, lengths)
        books.append(_canonical_codes(lengths))
    gb, rb, bb, ab, db = books
    for px in argb:
        _put_sym(bw, gb, px[2])
        _put_sym(bw, rb, px[1])
        _put_sym(bw, bb, px[3])
        _put_sym(bw, ab, px[0])
    return {"g": gb, "r": rb, "b": bb, "a": ab, "d": db}


def test_roundtrip_exact_sweep():
    rng = np.random.default_rng(0)
    for shape in [(1, 1, 3), (1, 2, 3), (5, 7, 3), (16, 16, 3),
                  (9, 13, 4), (30, 20, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_webp(img)
        assert is_webp(data)
        out = decode_webp(data)
        ref = (img if shape[2] == 4 else
               np.dstack([img, np.full(shape[:2], 255, np.uint8)]))
        assert (out == ref).all(), shape
    g = rng.integers(0, 256, (12, 8), dtype=np.uint8)
    out = decode_webp(encode_webp(g))
    assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()


def test_hand_built_single_pixel_stream():
    """Fully hand-assembled 1x1 stream: five SIMPLE prefix codes (the
    single-symbol form costs zero bits per pixel), pinning the header
    layout and LSB-first packing."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)   # no transform
    bw.write(0, 1)   # no cache
    bw.write(0, 1)   # no meta
    for sym in (42, 10, 30, 255, 0):   # G, R, B, A, dist
        bw.write(1, 1)   # simple
        bw.write(0, 1)   # one symbol
        bw.write(1, 1)   # 8-bit symbol
        bw.write(sym, 8)
    out = decode_webp(_wrap(bw.finish()))
    assert out.shape == (1, 1, 4)
    assert out[0, 0].tolist() == [10, 42, 30, 255]   # RGBA


def test_subtract_green_transform():
    img = np.array([[[100, 80, 90], [10, 200, 5]]], dtype=np.uint8)  # RGB
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)   # transform present
    bw.write(2, 2)   # subtract-green
    bw.write(0, 1)   # no more transforms
    argb = []
    for r, g, b in img[0]:
        argb.append((255, (int(r) - int(g)) & 0xFF, int(g),
                     (int(b) - int(g)) & 0xFF))
    _emit_literal_image(bw, np.array(argb, dtype=np.int64))
    out = decode_webp(_wrap(bw.finish()))
    assert (out[0, :, :3] == img[0]).all()


def test_palette_transform_with_packing():
    """3-color palette -> pack=2 (four 2-bit indices per green byte)."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1, 0], [2, 2, 1, 0, 0]], dtype=np.uint8)
    w, h = 5, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)   # transform present
    bw.write(3, 2)   # color indexing
    bw.write(len(pal) - 1, 8)
    # transform data (the DELTA-coded 3x1 palette image) comes INSIDE
    # the transform loop, before the next transform-present bit
    deltas = []
    prev = np.zeros(4, dtype=np.int64)
    for r, g, b in pal:
        cur = np.array([255, r, g, b], dtype=np.int64)
        deltas.append(tuple((cur - prev) & 0xFF))
        prev = cur
    _emit_literal_image(bw, np.array(deltas, dtype=np.int64), top=False)
    bw.write(0, 1)   # no further transforms
    # packed spatial image: width ceil(5/4) = 2
    packed_rows = []
    for row in idx:
        vals = []
        for s in range(0, w, 4):
            byte = 0
            for k, v in enumerate(row[s:s + 4]):
                byte |= int(v) << (2 * k)
            vals.append(byte)
        packed_rows.append(vals)
    packed = np.array(packed_rows, dtype=np.int64)
    argb = np.zeros((packed.size, 4), dtype=np.int64)
    argb[:, 0] = 255
    argb[:, 2] = packed.ravel()
    _emit_literal_image(bw, argb)
    out = decode_webp(_wrap(bw.finish()))
    assert out.shape == (2, 5, 4)
    assert (out[:, :, :3] == pal[idx]).all()


def test_predictor_transform_mode_left():
    """Predictor transform, one block, mode 1 (= left). Residuals are
    derived with the spec rules (corner = 0xff000000 pred, first row
    uses L, first column uses T)."""
    img = np.array([[10, 30, 200], [55, 60, 61]], dtype=np.uint8)
    h, w = img.shape
    argb_img = np.zeros((h, w, 4), dtype=np.int64)
    argb_img[:, :, 0] = 255
    for c in range(1, 4):
        argb_img[:, :, c] = img
    residuals = np.zeros_like(argb_img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = argb_img[y, x - 1]
            elif x == 0:
                pred = argb_img[y - 1, x]
            else:
                pred = argb_img[y, x - 1]     # mode 1 = L
            residuals[y, x] = (argb_img[y, x] - pred) & 0xFF
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)   # transform present
    bw.write(0, 2)   # predictor
    bw.write(2, 3)   # block bits = 2+2 = 4 -> one 16x16 block
    # mode image (transform data, inside the loop): 1x1, green = mode 1
    _emit_literal_image(bw, np.array([(255, 0, 1, 0)], dtype=np.int64), top=False)
    bw.write(0, 1)   # no further transforms
    _emit_literal_image(bw, residuals.reshape(-1, 4))
    out = decode_webp(_wrap(bw.finish()))
    for c in range(3):
        assert (out[:, :, c] == img).all(), c


def test_color_cache_and_lz77():
    """1x5 image A B <backref len 2 dist 2> <cache hit of B> ->
    A B A B B: exercises the LZ77 length/distance path (plain distance
    code 122 -> dist 2 via prefix sym 13 + 5 extra bits) and the color
    cache (hash-indexed insert on every emitted pixel)."""
    A = (255, 1, 2, 3)
    B = (255, 9, 8, 7)
    cache_bits = 4
    def cache_key(px):
        a, r, g, b = px
        argb = (a << 24) | (r << 16) | (g << 8) | b
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    w, h = 5, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)   # no transform
    # spatial image with cache + hand codes
    bw.write(1, 1)
    bw.write(cache_bits, 4)
    bw.write(0, 1)   # no meta
    green_alpha = 256 + 24 + (1 << cache_bits)
    # green alphabet: literals 2 and 8, length-sym 257 (len 2),
    # cache sym 280 + key(B)
    cacheB = 280 + cache_key(B)
    gsyms = [2, 8, 257, cacheB]
    glen = [0] * green_alpha
    for s in gsyms:
        glen[s] = 2
    _write_prefix_code(bw, glen)
    gb = _canonical_codes(glen)
    for vals, size in [([1, 9], 256), ([3, 7], 256), ([255], 256)]:
        lengths = [0] * size
        if len(vals) == 1:
            lengths[vals[0]] = 1
        else:
            for v in vals:
                lengths[v] = 1
        _write_prefix_code(bw, lengths)
        if size == 256 and vals == [1, 9]:
            rb = _canonical_codes(lengths)
        elif size == 256 and vals == [3, 7]:
            bb = _canonical_codes(lengths)
        else:
            ab = _canonical_codes(lengths)
    # dist code: symbol 1 -> value 2 -> dist-map entry (1,0) -> dist 1?
    # (dx,dy)=(1,0) -> dist = 0*6+1 = 1; we want dist 2 -> map (2,0) is
    # code 6 -> _lz77_extra must yield 6: sym 4 gives offset (2<<1)=4,
    # +bits(1)+1 -> 5 or 6. Use plain distance instead: dist_code 122
    # -> dist 2. value 122: sym? offset+extra: sym 12 -> extra=(12-2)>>1=5,
    # offset=(2+0)<<5=64, value=64+bits(5)+1 -> 65..96. sym 13: offset
    # (3<<5)=96 value 97..128 -> 122 = 96 + 25 + 1 -> bits=25.
    dlen = [0] * 40
    dlen[13] = 1
    _write_prefix_code(bw, dlen)
    db = _canonical_codes(dlen)

    # pixels: A literal, B literal, backref(len2, dist2) -> A B, cache hit B
    _put_sym(bw, gb, 2); _put_sym(bw, rb, 1); _put_sym(bw, bb, 3); _put_sym(bw, ab, 255)
    _put_sym(bw, gb, 8); _put_sym(bw, rb, 9); _put_sym(bw, bb, 7); _put_sym(bw, ab, 255)
    _put_sym(bw, gb, 257)            # length prefix sym 1 -> length 2
    _put_sym(bw, db, 13)             # distance prefix sym 13
    bw.write(25, 5)                  # extra bits -> dist_code 122 -> dist 2
    _put_sym(bw, gb, cacheB)         # cache hit of B
    out = decode_webp(_wrap(bw.finish()))
    exp = np.array([[(1, 2, 3, 255), (9, 8, 7, 255), (1, 2, 3, 255),
                     (9, 8, 7, 255), (9, 8, 7, 255)]], dtype=np.uint8)
    assert (out == exp).all(), out.tolist()


def test_error_gating():
    good = encode_webp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxWAVE....")
    with pytest.raises(ValueError):
        decode_webp(good[:-6])
    with pytest.raises(NotImplementedError):   # lossy VP8 chunk
        lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                 + b"VP8 " + struct.pack("<I", 0))
        decode_webp(lossy)


def test_webp_through_decode_features(spark):
    from openair_spark.ops.multimodal import decode_features

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (8, 11, 3), dtype=np.uint8)
    payload = encode_webp(img)
    assets = spark.createDataFrame(
        [("w1", "webp", bytearray(payload))],
        "asset_id string, kind string, payload binary")
    row = decode_features(assets, fake=False).collect()[0]
    luma = (0.299 * img[:, :, 0].astype(float)
            + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
    assert (row["height"], row["width"]) == (8, 11)
    assert abs(row["mean_luma"] - float(luma.mean())) < 1e-9


def test_color_transform_inverse():
    """Color transform, one block: elements packed per spec (B channel
    = green_to_red, G = green_to_blue, R = red_to_blue). Forward
    residuals derived with the spec delta = (int8(t)*int8(v))>>5, blue
    depending on the RESTORED red."""
    g2r, g2b, r2b = 20, 250, 7   # stored bytes (250 = -6 as int8)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)  # RGB truth

    def delta(t, v):
        def i8(x):
            x = int(x) & 0xFF
            return x - 256 if x >= 128 else x
        return (i8(t) * i8(v)) >> 5

    h, w = img.shape[:2]
    argb = np.zeros((h, w, 4), dtype=np.int64)
    argb[:, :, 0] = 255
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            tr = (r - delta(g2r, g)) & 0xFF          # forward transform
            tb = (b - delta(g2b, g) - delta(r2b, (tr + delta(g2r, g)) & 0xFF)) & 0xFF
            argb[y, x, 1:] = (tr, g, tb)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)   # transform present
    bw.write(1, 2)   # color transform
    bw.write(2, 3)   # block bits 4 -> single block
    _emit_literal_image(bw, np.array([(255, r2b, g2b, g2r)], dtype=np.int64),
                        top=False)
    bw.write(0, 1)   # no further transforms
    _emit_literal_image(bw, argb.reshape(-1, 4))
    out = decode_webp(_wrap(bw.finish()))
    assert (out[:, :, :3] == img).all()


def test_uniform_histogram_roundtrip():
    """ADVICE r5: a perfectly uniform histogram (every byte value once
    per channel) degenerates the code-length code to a single used
    symbol; the encoder must mirror the decoder's zero-bit-per-length
    read or the stream desyncs ('empty prefix code')."""
    import numpy as np

    from openair_spark.ops.webp import decode_webp, encode_webp

    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([vals, np.rot90(vals).copy(), vals.T.copy()], axis=2)
    out = decode_webp(encode_webp(img))
    ref = np.dstack([img, np.full((16, 16), 255, np.uint8)])
    assert np.array_equal(out, ref)
