"""From-scratch PNG codec tests (ops/png.py).

Filter coverage uses a TEST-SIDE forward filterer (independent of the
codec's encoder, which only emits filter 0): each scanline of a known
image is filtered per PNG spec §9 with a chosen filter type, packed
into hand-built chunks, and the decoder must reconstruct the original
pixels exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from openair_spark.ops.png import decode_png, encode_png, is_png


def _rng_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _build_png(ihdr_fields, chunks_after_ihdr):
    out = b"\x89PNG\r\n\x1a\n"
    body = struct.pack(">IIBBBBB", *ihdr_fields)
    for ctype, cbody in [(b"IHDR", body)] + chunks_after_ihdr + [(b"IEND", b"")]:
        out += (struct.pack(">I", len(cbody)) + ctype + cbody
                + struct.pack(">I", zlib.crc32(ctype + cbody) & 0xFFFFFFFF))
    return out


def _filter_scanlines(img: np.ndarray, ftype: int) -> bytes:
    """Forward-filter every scanline with one filter type (spec §9)."""
    h, w, ch = img.shape
    raw = img.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = int(row[x - ch]) if x >= ch else 0
            up = int(prior[x])
            ul = int(prior[x - ch]) if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[x] = (row[x] - pred) % 256
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prior = row
    return bytes(out)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16)])
def test_roundtrip_gray(shape):
    img = _rng_img(shape, seed=shape[0])
    got = decode_png(encode_png(img))
    assert got.shape == (*shape, 1)
    assert (got[:, :, 0] == img).all()


@pytest.mark.parametrize("ch", [3, 4])
def test_roundtrip_color(ch):
    img = _rng_img((11, 9, ch), seed=ch)
    got = decode_png(encode_png(img))
    assert got.shape == img.shape
    assert (got == img).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch,color_type", [(1, 0), (3, 2), (4, 6)])
def test_all_filter_types_reconstruct(ftype, ch, color_type):
    img = _rng_img((9, 7, ch), seed=10 * ftype + ch)
    idat = zlib.compress(_filter_scanlines(img, ftype))
    data = _build_png((7, 9, 8, color_type, 0, 0, 0), [(b"IDAT", idat)])
    got = decode_png(data)
    assert (got.reshape(img.shape) == img).all(), f"filter {ftype} ch {ch}"


def test_mixed_filters_and_split_idat():
    """Different filter per scanline + IDAT split across chunks."""
    img = _rng_img((5, 6, 3), seed=99)
    h, w, ch = img.shape
    raw = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prior = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        ftype = y % 5
        row = raw[y]
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = int(row[x - ch]) if x >= ch else 0
            up = int(prior[x])
            ul = int(prior[x - ch]) if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[x] = (row[x] - pred) % 256
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prior = row
    z = zlib.compress(bytes(out))
    mid = len(z) // 2
    data = _build_png((w, h, 8, 2, 0, 0, 0),
                      [(b"IDAT", z[:mid]), (b"IDAT", z[mid:])])
    assert (decode_png(data) == img).all()


def test_palette_image():
    pal = _rng_img((4, 3), seed=1)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    idat = zlib.compress(_filter_scanlines(idx[:, :, None], 0))
    data = _build_png((4, 2, 8, 3, 0, 0, 0),
                      [(b"PLTE", pal.tobytes()), (b"IDAT", idat)])
    got = decode_png(data)
    assert got.shape == (2, 4, 3)
    assert (got == pal[idx]).all()


def test_palette_with_trns_alpha():
    pal = _rng_img((3, 3), seed=2)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    idat = zlib.compress(_filter_scanlines(idx[:, :, None], 0))
    data = _build_png((2, 2, 8, 3, 0, 0, 0),
                      [(b"PLTE", pal.tobytes()),
                       (b"tRNS", bytes([10, 200])),
                       (b"IDAT", idat)])
    got = decode_png(data)
    assert got.shape == (2, 2, 4)
    assert (got[:, :, :3] == pal[idx]).all()
    assert got[0, 0, 3] == 10 and got[0, 1, 3] == 200 and got[1, 0, 3] == 255


def test_error_gating():
    img = _rng_img((4, 4), seed=3)
    good = encode_png(img)
    assert is_png(good) and not is_png(b"JFIF" + good)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):  # interlace flag with wrong layout
        idat = zlib.compress(_filter_scanlines(img[:, :, None], 0))
        decode_png(_build_png((4, 4, 8, 0, 0, 0, 2), [(b"IDAT", idat)]))
    with pytest.raises(ValueError):  # corrupted chunk CRC
        bad = bytearray(good)
        bad[-5] ^= 0xFF
        decode_png(bytes(bad))
    with pytest.raises(ValueError):  # truncated IDAT stream
        decode_png(_build_png((4, 4, 8, 0, 0, 0, 0),
                              [(b"IDAT", zlib.compress(b"\x00" * 5))]))
    with pytest.raises(ValueError):  # garbage (non-zlib) IDAT -> ValueError,
        # not a leaking zlib.error (module error contract, ADVICE r4)
        decode_png(_build_png((4, 4, 8, 0, 0, 0, 0),
                              [(b"IDAT", b"\xff\xfe not zlib")]))
    with pytest.raises(ValueError):  # hostile IHDR dims: no multi-GB alloc
        decode_png(_build_png((1 << 24, 1 << 24, 8, 0, 0, 0, 0),
                              [(b"IDAT", zlib.compress(b""))]))
    with pytest.raises(ValueError):  # zero-size dims
        decode_png(_build_png((0, 4, 8, 0, 0, 0, 0),
                              [(b"IDAT", zlib.compress(b""))]))


def test_hypothesis_roundtrip_random_shapes():
    """Property: encode->decode is the identity for arbitrary shapes and
    channel counts (uses hypothesis if available, else a seeded sweep)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.integers(1, 40), st.integers(1, 40),
               st.sampled_from([1, 3, 4]), st.integers(0, 2 ** 31 - 1))
        def roundtrip(h, w, ch, seed):
            img = np.random.default_rng(seed).integers(
                0, 256, (h, w, ch), dtype=np.uint8)
            got = decode_png(encode_png(img))
            assert (got.reshape(img.shape) == img).all()

        roundtrip()
    except ImportError:  # pragma: no cover
        for seed in range(40):
            rng = np.random.default_rng(seed)
            h, w = int(rng.integers(1, 41)), int(rng.integers(1, 41))
            ch = int(rng.choice([1, 3, 4]))
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            assert (decode_png(encode_png(img)).reshape(img.shape) == img).all()


def _adam7_passes(w, h):
    return [(x0, y0, dx, dy) for x0, y0, dx, dy in
            [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
            if (w - x0 + dx - 1) // dx > 0 and (h - y0 + dy - 1) // dy > 0]


def test_adam7_interlaced_decode():
    """Hand-interlace an RGB image into the 7-pass layout (filter 0
    scanlines per pass) and decode; output must equal the original."""
    img = _rng_img((11, 13, 3), seed=21)
    h, w, ch = img.shape
    stream = bytearray()
    for x0, y0, dx, dy in _adam7_passes(w, h):
        sub = img[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        for y in range(ph):
            stream += b"\x00" + sub[y].tobytes()
    idat = zlib.compress(bytes(stream))
    data = _build_png((w, h, 8, 2, 0, 0, 1), [(b"IDAT", idat)])
    assert (decode_png(data) == img).all()


def test_16bit_depth_high_byte():
    """16-bit gray: decoder keeps the high byte of each big-endian
    sample (standard 8-bit reduction)."""
    hi = _rng_img((5, 7), seed=8)
    lo = _rng_img((5, 7), seed=9)
    rows = bytearray()
    for y in range(5):
        rows += b"\x00"
        for x in range(7):
            rows += bytes([hi[y, x], lo[y, x]])
    data = _build_png((7, 5, 16, 0, 0, 0, 0),
                      [(b"IDAT", zlib.compress(bytes(rows)))])
    out = decode_png(data)
    assert (out[:, :, 0] == hi).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_depths(depth):
    """1/2/4-bit gray: MSB-first packed pixels scale to full range."""
    import numpy as np

    w, h = 10, 3
    maxv = (1 << depth) - 1
    vals = np.arange(w * h).reshape(h, w) % (maxv + 1)
    per = 8 // depth
    rows = bytearray()
    for y in range(h):
        rows += b"\x00"
        for s in range(0, w, per):
            byte = 0
            chunk = vals[y, s:s + per]
            for k, v in enumerate(chunk):
                byte |= int(v) << (8 - depth * (k + 1))
            rows += bytes([byte])
    data = _build_png((w, h, depth, 0, 0, 0, 0),
                      [(b"IDAT", zlib.compress(bytes(rows)))])
    out = decode_png(data)
    expect = (vals * 255 // maxv).astype("uint8")
    assert (out[:, :, 0] == expect).all()


def test_subbyte_palette():
    """2-bit palette indices expand through PLTE without scaling."""
    import numpy as np

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [7, 7, 7]],
                   dtype="uint8")
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], dtype="uint8")
    rows = bytearray()
    for y in range(2):
        rows += b"\x00"
        byte = 0
        for k in range(4):
            byte |= int(idx[y, k]) << (8 - 2 * (k + 1))
        rows += bytes([byte, int(idx[y, 4]) << 6])
    data = _build_png((5, 2, 2, 3, 0, 0, 0),
                      [(b"PLTE", pal.tobytes()),
                       (b"IDAT", zlib.compress(bytes(rows)))])
    out = decode_png(data)
    assert (out == pal[idx]).all()
