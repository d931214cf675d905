"""From-scratch WAV (RIFF/PCM) codec — stdlib struct + numpy.

Makes the AUDIO lane of the multimodal surface real, the same way
ops/png.py (RFC 2083) and ops/jpeg.py (ITU-T T.81) did for images:
WAV is the uncompressed interchange format of audio pipelines, and its
container (RIFF chunks + PCM samples) is fully decodable from the
public Microsoft/IBM RIFF spec with no codec library.

Scope: canonical RIFF/WAVE with a 'fmt ' chunk of format 1 (PCM,
8/16/32-bit int) or 3 (IEEE float32), any channel count and sample
rate, samples interleaved little-endian; unknown chunks are skipped.
Compressed formats (ADPCM, mu-law, MP3-in-WAV) raise
NotImplementedError; corrupt input raises ValueError (same contract as
the other codecs).

decode_wav -> (samples float64 in [-1, 1] shaped (n_frames, channels),
sample_rate); encode_wav takes the same shape back to PCM16 bytes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_FRAMES = 256_000_000  # hostile-header allocation guard (~2 GB float64 mono)


def is_wav(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WAVE")


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, channels) -> PCM16
    RIFF/WAVE bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] == 0:
        raise ValueError("expected (n_frames[, channels]) samples")
    n, ch = arr.shape
    # scale by 32768 (the decoder's divisor) so encode->decode is pure
    # half-step quantization error, not a 1/32768 gain mismatch
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = bytearray()
    out += b"RIFF"
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return bytes(out)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (float64 samples in [-1, 1] shaped
    (n_frames, channels), sample_rate)."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block, bits = fmt
    if ch == 0 or rate == 0:
        raise ValueError("zero channels/sample-rate")
    if audio_format == 1 and bits in (8, 16, 32):
        if bits == 8:   # PCM8 is unsigned
            raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        else:
            dt = "<i2" if bits == 16 else "<i4"
            scale = float(1 << (bits - 1))
            samples = np.frombuffer(payload, dtype=dt).astype(np.float64) / scale
    elif audio_format == 3 and bits == 32:
        samples = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit not supported "
            "(PCM 8/16/32 and float32 only)")
    frames = len(samples) // ch
    if frames > _MAX_FRAMES:
        raise ValueError(f"{frames} frames exceeds decoder cap")
    return samples[: frames * ch].reshape(frames, ch), rate
