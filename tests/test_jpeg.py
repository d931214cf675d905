"""From-scratch JPEG codec tests (ops/jpeg.py).

The encoder<->decoder round-trip shares the Annex K tables, so the
entropy layer is additionally pinned by a HAND-ASSEMBLED bitstream
(a single 8x8 block whose Huffman codes, magnitude bits, and zigzag
placement were derived by hand from the T.81 Annex K code lengths) —
a table or bit-order typo in the decoder cannot cancel against the
encoder there.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.jpeg import (
    _C,
    _fdct,
    _idct,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def test_dct_is_orthogonal_inverse():
    rng = np.random.default_rng(0)
    b = rng.uniform(-128, 127, (7, 8, 8))
    assert np.allclose(_idct(_fdct(b)), b, atol=1e-9)
    # basis orthonormality: C @ C.T == I
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def _smooth(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return (128 + 60 * np.sin(xx / 9) + 50 * np.cos(yy / 7)).clip(0, 255).astype(np.uint8)


def test_gray_roundtrip_high_quality():
    img = _smooth(33, 40)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_gray_q100_near_exact_on_noise():
    """Quality 100 -> all-ones quant tables: the only loss is float
    rounding, so even white noise must reconstruct within 1 count."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_flat_image_exact():
    """A constant image is DC-only. At quality 100 (quant step 1) any
    level reconstructs exactly; at quality 50 the luma DC step is 16,
    so levels whose shifted DC (8*(level-128)) is a multiple of 16
    survive quantization exactly."""
    for level in (0, 77, 130, 255):
        img = np.full((16, 24), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert (out == level).all(), level
    for level in (0, 130):  # 8*(level-128) % 16 == 0
        img = np.full((16, 24), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=50))
        assert (out == level).all(), level


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_color_roundtrip_subsampling(sub):
    base = _smooth(33, 40)
    rgb = np.stack([base, np.roll(base, 5, 0), np.roll(base, 5, 1)], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling=sub))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    # 4:4:4 keeps chroma; subsampled variants lose detail at gradients
    assert err.max() <= (8 if sub == "4:4:4" else 64)
    assert err.mean() <= (1.5 if sub == "4:4:4" else 8.0)


def test_restart_markers_roundtrip():
    base = _smooth(40, 56)
    rgb = np.stack([base, base[::-1], base[:, ::-1]], axis=-1)
    plain = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="4:2:0"))
    rst = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="4:2:0",
                                  restart_interval=2))
    # restarts change the entropy framing, not the reconstruction
    assert (plain == rst).all()


def _marker(tag, body):
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _hand_built_single_block() -> bytes:
    """Hand-assembled baseline JPEG: 8x8 grayscale, all-ones DQT,
    Annex K luma Huffman tables, one block with DC=5 and the first
    zigzag AC = -2.

    Bitstream derived by hand from the Annex K BITS arrays:
      DC: category 3 -> code '100' (3rd len-3 code after '010','011'),
          diff 5 -> appended bits '101'
      AC: (run 0, size 2) = symbol 0x02 -> 2nd len-2 code '01',
          value -2 -> appended bits '01' (-2 + (1<<2) - 1 = 1)
      EOB (0x00) -> 1st len-4 code '1010'
    -> 100 101 01 01 1010 + '11' pad = 0x95 0x6B
    """
    from openair_spark.ops.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        ZIGZAG,
    )

    out = bytearray(b"\xFF\xD8")
    dqt = np.ones(64, dtype=np.int32)
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in dqt))
    out += _marker(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _marker(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    out += _marker(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))
    out += _marker(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3F\x00")
    out += bytes([0x95, 0x6B])
    out += b"\xFF\xD9"
    return bytes(out)


def test_hand_built_bitstream_pins_entropy_layer():
    data = _hand_built_single_block()
    got = decode_jpeg(data)
    # expected: coefficients F[0,0]=5, F[0,1]=-2 (zigzag index 1 is
    # raster position (0,1)), dequant x1, IDCT + 128
    F = np.zeros((8, 8))
    F[0, 0] = 5.0
    F[0, 1] = -2.0
    expected = np.clip(np.round(_idct(F[None])[0] + 128.0), 0, 255).astype(np.uint8)
    assert got.shape == (8, 8)
    assert (got == expected).all()


def test_error_gating():
    img = _smooth(16, 16)
    good = encode_jpeg(img, quality=80)
    assert is_jpeg(good) and not is_jpeg(b"\x89PNG" + good)
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    with pytest.raises(NotImplementedError):  # progressive SOF2
        bad = bytearray(good)
        idx = bad.find(b"\xFF\xC0")
        bad[idx + 1] = 0xC2
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):  # truncated entropy stream
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError):  # hostile SOF dimensions
        bad = bytearray(good)
        idx = bad.find(b"\xFF\xC0")
        struct.pack_into(">HH", bad, idx + 5, 65000, 65000)
        decode_jpeg(bytes(bad))


def test_odd_dimensions_and_tiny_images():
    rng = np.random.default_rng(9)
    for shape in [(1, 1), (3, 5), (8, 8), (9, 17), (15, 7, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape[:2] == shape[:2]
        ref = img if img.ndim == 3 else img
        assert np.abs(out.astype(int).reshape(ref.shape)
                      - ref.astype(int)).max() <= 3


def test_hypothesis_roundtrip_random_shapes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.booleans(),
           st.integers(0, 2 ** 31 - 1))
    def run(h, w, color, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape[:2] == (h, w)
        assert np.abs(out.astype(int).reshape(img.shape)
                      - img.astype(int)).max() <= 3

    run()
