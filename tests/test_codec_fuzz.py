"""Adversarial robustness of the from-scratch codecs: every decoder
must either succeed or raise its documented error types
(ValueError / NotImplementedError) on truncated and bit-flipped
inputs — never crash with an unrelated exception class, hang, or
attempt a hostile allocation. Hypothesis drives the mutations."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openair_spark.ops.avi import decode_mjpeg_avi, encode_mjpeg_avi
from openair_spark.ops.bmp import decode_bmp, encode_bmp
from openair_spark.ops.gif import decode_gif, encode_gif
from openair_spark.ops.ico import decode_ico, encode_ico
from openair_spark.ops.jpeg import decode_jpeg, encode_jpeg
from openair_spark.ops.png import decode_png, encode_png
from openair_spark.ops.tiff import decode_tiff, encode_tiff
from openair_spark.ops.wav import decode_wav, encode_wav
from openair_spark.ops.webp import decode_webp, encode_webp

_RNG = np.random.default_rng(42)
_IMG = _RNG.integers(0, 256, (12, 10, 3), dtype=np.uint8)
_PAL_IMG = np.array([[0, 1], [2, 1]], dtype=np.uint8)

_CODECS = {
    "png": (encode_png(_IMG), decode_png),
    "jpeg": (encode_jpeg(_IMG, quality=90), decode_jpeg),
    "gif": (encode_gif(np.stack([_PAL_IMG] * 3, -1) * 80), decode_gif),
    "bmp": (encode_bmp(_IMG), decode_bmp),
    "webp": (encode_webp(_IMG), decode_webp),
    "wav": (encode_wav(_RNG.uniform(-1, 1, 400), 8000), decode_wav),
    "tiff": (encode_tiff(_IMG, "lzw"), decode_tiff),
    "ico": (encode_ico([_IMG[:8, :8]]), decode_ico),
    "avi": (encode_mjpeg_avi([_IMG, _IMG[::-1]], fps=5), decode_mjpeg_avi),
}

_ALLOWED = (ValueError, NotImplementedError)


@pytest.mark.parametrize("name", sorted(_CODECS))
def test_truncations_fail_cleanly(name):
    data, decode = _CODECS[name]
    for cut in range(0, len(data), max(1, len(data) // 40)):
        try:
            decode(data[:cut])
        except _ALLOWED:
            pass
        # a short prefix that still decodes (e.g. trailing padding cut)
        # is acceptable; any OTHER exception type propagates and fails


@pytest.mark.parametrize("name", sorted(_CODECS))
@settings(max_examples=60, deadline=None)
@given(st.data())
def test_bit_flips_fail_cleanly(name, data):
    payload, decode = _CODECS[name]
    buf = bytearray(payload)
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] ^= 1 << data.draw(st.integers(0, 7))
    try:
        out = decode(bytes(buf))
    except _ALLOWED:
        return
    # decoded despite the flip: output must still be bounded/sane
    if name == "wav":
        samples, rate = out
        assert samples.size <= 10_000_000
    elif name in ("gif", "avi"):
        frames = out[0]
        assert len(frames) <= 10_000
