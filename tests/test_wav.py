"""From-scratch WAV codec + audio feature lane tests (ops/wav.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openair_spark.ops.wav import decode_wav, encode_wav, is_wav


def test_pcm16_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(0)
    for shape in [(800,), (500, 2), (333, 3)]:
        x = rng.uniform(-0.9, 0.9, shape)
        data = encode_wav(x, sample_rate=8000)
        assert is_wav(data)
        y, rate = decode_wav(data)
        assert rate == 8000
        ref = x[:, None] if x.ndim == 1 else x
        assert y.shape == ref.shape
        # PCM16 quantization: half-step absolute error
        assert np.abs(y - ref).max() <= 1.0 / 32767 + 1e-9


def test_sine_statistics_survive_roundtrip():
    t = np.arange(4000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert abs(float(np.sqrt((y ** 2).mean())) - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(float(np.abs(y).max()) - 0.5) < 1e-3


def test_float32_and_pcm8_formats():
    x = np.linspace(-1, 1, 256)
    # hand-build float32 (format 3) and PCM8 (format 1 / 8-bit) files
    def build(fmt_code, bits, payload):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * bits // 8,
                          bits // 8, bits)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(payload)) + payload
        return out

    f32, rate = decode_wav(build(3, 32, x.astype("<f4").tobytes()))
    assert rate == 8000 and np.allclose(f32[:, 0], x, atol=1e-7)
    p8, _ = decode_wav(build(1, 8, ((x * 127) + 128).clip(0, 255)
                             .astype(np.uint8).tobytes()))
    assert np.abs(p8[:, 0] - x).max() <= 1.5 / 127


def test_unknown_chunks_skipped_and_error_gating():
    x = np.zeros(100)
    good = bytearray(encode_wav(x, 8000))
    # splice an unknown chunk between fmt and data
    idx = bytes(good).find(b"data")
    spliced = bytes(good[:idx]) + b"LIST" + struct.pack("<I", 4) + b"INFO" + bytes(good[idx:])
    spliced = bytearray(spliced)
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    y, _ = decode_wav(bytes(spliced))
    assert y.shape == (100, 1)

    with pytest.raises(ValueError):
        decode_wav(b"not audio at all....")
    with pytest.raises(ValueError):       # truncated data chunk
        decode_wav(bytes(good[:-10]))
    with pytest.raises(NotImplementedError):  # ADPCM format code
        bad = bytearray(good)
        fidx = bytes(bad).find(b"fmt ") + 8
        struct.pack_into("<H", bad, fidx, 2)
        decode_wav(bytes(bad))


def test_audio_features_lane(spark):
    """synth_wav_assets emits real PCM16 WAVs; audio_features decodes
    them and the stats must match the PRE-quantization source waveform
    within the PCM16 error bound (independent truth)."""
    from openair_spark.ops.multimodal import (
        audio_features,
        synth_wav_assets,
        synth_wav_audio,
    )
    from openair_spark.spark.corpus import pages_df

    assets = synth_wav_assets(pages_df(spark, 10, "mm-wav")).cache()
    rows = assets.select("url", "asset_id", "meta", "payload").collect()
    assert len(rows) == 10
    for r in rows:
        assert r["meta"]["content_type"] == "audio/wav"
        assert bytes(r["payload"])[:4] == b"RIFF"
    feats = {r["asset_id"]: r for r in audio_features(assets).collect()}
    for r in rows:
        src = synth_wav_audio(r["url"])
        f = feats[r["asset_id"]]
        assert f["n_channels"] == 1 and f["sample_rate"] == 8000
        assert f["n_frames"] == len(src)
        assert abs(f["rms"] - float(np.sqrt((src ** 2).mean()))) < 1e-3
        assert abs(f["peak"] - float(np.abs(src).max())) < 1e-3
    assets.unpersist()


def _build_wav(fmt_code, ch, rate, block_align, bits, payload):
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * ch * max(bits, 8) // 8,
                      block_align, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return out


def test_mulaw_and_alaw_decode():
    """All 256 G.711 bytes decode through the standard expansion; the
    expansions must be sign-symmetric and monotone per segment, and
    mu-law of the 0xFF code is exactly 0."""
    from openair_spark.ops.wav import _alaw_decode_table, _mulaw_decode_table

    for fmt_code, table in [(7, _mulaw_decode_table()),
                            (6, _alaw_decode_table())]:
        payload = bytes(range(256))
        y, rate = decode_wav(_build_wav(fmt_code, 1, 8000, 1, 8, payload))
        assert rate == 8000 and y.shape == (256, 1)
        assert np.allclose(y[:, 0], table.astype(np.float64) / 32768.0)
    mu = _mulaw_decode_table()
    assert mu[0xFF] == 0                       # mu-law zero code
    # sign symmetry: byte with sign bit flipped negates the sample
    assert (mu[np.arange(128)] == -mu[np.arange(128) ^ 0x80]).all()
    al = _alaw_decode_table()
    assert (al[np.arange(128) | 0x80] == -al[np.arange(128)]).all()


def test_ima_adpcm_hand_block():
    """Hand-decoded first steps of a known block: predictor 100,
    index 0 (step 7), nibbles 0, 2, 8 -> samples derived by hand from
    the IMA update rule."""
    from openair_spark.ops.wav import decode_wav

    # block: header (pred=100, idx=0), one 4-byte word of nibbles
    # nibbles packed low-first: byte0 = 0 | (2 << 4), byte1 = 8, rest 0
    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x20, 0x08, 0, 0])
    data = _build_wav(0x11, 1, 8000, len(block), 4, block)
    y, _ = decode_wav(data)
    pcm = np.round(y[:, 0] * 32768.0).astype(int)
    # hand: s0=100. nib 0: step 7, d=0(>>3 of 7 = 0)... d = 7>>3 = 0 -> +0
    #   -> 100, idx += -1 -> 0
    # nib 2: step 7 -> d = 0 + (7>>1)=3 -> 103, idx 0 + (-1) -> 0
    # nib 8: step 7 -> d = 0, sign -> 103 - 0 = 103, idx stays 0
    assert pcm[0] == 100 and pcm[1] == 100 and pcm[2] == 103 and pcm[3] == 103


def test_ima_adpcm_roundtrip_snr():
    """Encode a sine with the fixture encoder; decode must track the
    source closely (ADPCM is lossy; demand >20 dB SNR) and exactly
    reproduce the encoder's internal reconstruction."""
    from openair_spark.ops.wav import encode_wav_ima_adpcm

    t = np.arange(2000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 300 * t)
    data = encode_wav_ima_adpcm(x, 8000)
    y, rate = decode_wav(data)
    assert rate == 8000
    n = len(x)
    err = y[:n, 0] - x
    snr = 10 * np.log10((x ** 2).mean() / max((err ** 2).mean(), 1e-12))
    assert snr > 20.0, snr


def test_ms_adpcm_roundtrip_snr():
    """Test-side MS-ADPCM encoder (predictor 0: coef [256, 0] -> pred =
    previous sample) -> module decoder must track the source >20 dB."""
    t = np.arange(1500) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 250 * t)
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(int)
    block_samples = 500
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    blocks = bytearray()
    i = 0
    block_align = None
    while i < len(pcm):
        chunk = pcm[i:i + block_samples]
        i += block_samples
        s2, s1 = int(chunk[0]), int(chunk[1]) if len(chunk) > 1 else int(chunk[0])
        delta = 128
        blocks += struct.pack("<Bhhh", 0, delta, s1, s2)
        nibbles = []
        prev, prev2 = s1, s2
        for s in chunk[2:]:
            pred = (prev * 256 + prev2 * 0) >> 8
            nib = int(np.clip(round((int(s) - pred) / delta), -8, 7))
            sample = int(np.clip(pred + nib * delta, -32768, 32767))
            prev2, prev = prev, sample
            delta = max(16, (adapt[nib & 0x0F] * delta) >> 8)
            nibbles.append(nib & 0x0F)
        if len(nibbles) % 2:
            nibbles.append(0)
        for k in range(0, len(nibbles), 2):
            blocks.append((nibbles[k] << 4) | nibbles[k + 1])
        if block_align is None:
            block_align = 7 + len(nibbles) // 2
    data = _build_wav(2, 1, 8000, block_align, 4, bytes(blocks))
    y, rate = decode_wav(data)
    assert rate == 8000
    n = min(len(y), len(x))
    err = y[:n, 0] - x[:n]
    snr = 10 * np.log10((x[:n] ** 2).mean() / max((err ** 2).mean(), 1e-12))
    assert snr > 20.0, snr


def test_unsupported_wav_formats_gated():
    with pytest.raises(NotImplementedError):   # MPEG-in-WAV (format 0x55)
        decode_wav(_build_wav(0x55, 1, 8000, 256, 16, b"\x00" * 256))
