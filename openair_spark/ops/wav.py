"""From-scratch WAV (RIFF/PCM) codec — stdlib struct + numpy.

Makes the AUDIO lane of the multimodal surface real, the same way
ops/png.py (RFC 2083) and ops/jpeg.py (ITU-T T.81) did for images:
WAV is the uncompressed interchange format of audio pipelines, and its
container (RIFF chunks + PCM samples) is fully decodable from the
public Microsoft/IBM RIFF spec with no codec library.

Scope: canonical RIFF/WAVE with a 'fmt ' chunk of format 1 (PCM,
8/16/32-bit int), 2 (MS-ADPCM), 3 (IEEE float32), 6 (A-law), 7
(mu-law), or 0x11 (IMA ADPCM, mono/stereo, standard block layout) —
the compressed telephony/voice formats decoded from their public
G.711 / IMA / Microsoft tables. Any channel count and sample rate;
unknown chunks are skipped. Remaining compressed formats (MP3-in-WAV)
raise NotImplementedError; corrupt input raises ValueError (same
contract as the other codecs).

decode_wav -> (samples float64 in [-1, 1] shaped (n_frames, channels),
sample_rate); encode_wav takes the same shape back to PCM16 bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

_MAX_FRAMES = 256_000_000  # hostile-header allocation guard (~2 GB float64 mono)

# MS-ADPCM tables (public Microsoft WAVE spec)
_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int32)
_MS_COEFS = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                      [240, 0], [460, -208], [392, -232]], dtype=np.int32)

# IMA ADPCM tables (public IMA/DVI specification)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767], dtype=np.int32)


def _mulaw_decode_table() -> np.ndarray:
    """G.711 mu-law byte -> linear PCM16 (standard expansion)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = ((mantissa << 3) + 0x84) << exponent
    sample = sample - 0x84
    return np.where(sign, -sample, sample).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """G.711 A-law byte -> linear PCM16 (standard expansion)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    sample = np.where(exponent == 0, (mantissa << 4) + 8,
                      ((mantissa << 4) + 0x108) << (exponent - 1))
    return np.where(sign, -sample, sample).astype(np.int16)


def _ima_adpcm_decode(payload: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk -> interleaved int16 samples (n, ch).
    Standard block layout: per channel a 4-byte header (int16
    predictor, uint8 step index, reserved), then 4-byte words of eight
    4-bit nibbles per channel, channels interleaved word-wise."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch) != 0:
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    spb = 1 + (block_align - 4 * ch) * 2 // ch   # samples per block/chan
    out_blocks = []
    for off in range(0, len(payload) - block_align + 1, block_align):
        block = payload[off:off + block_align]
        preds = np.zeros(ch, dtype=np.int32)
        idxs = np.zeros(ch, dtype=np.int32)
        chans = [[] for _ in range(ch)]
        for c in range(ch):
            p, si, _r = struct.unpack_from("<hBB", block, 4 * c)
            preds[c] = p
            idxs[c] = min(max(int(si), 0), 88)
            chans[c].append(p)
        pos = 4 * ch
        while pos + 4 * ch <= block_align:
            for c in range(ch):
                word = block[pos + 4 * c:pos + 4 * c + 4]
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = int(_IMA_STEP_TABLE[idxs[c]])
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = min(32767, max(-32768, int(preds[c])))
                        idxs[c] = min(88, max(0, int(
                            idxs[c] + _IMA_INDEX_TABLE[nib & 7])))
                        chans[c].append(int(preds[c]))
            pos += 4 * ch
        n = min(len(chans[0]), spb)
        blk = np.empty((n, ch), dtype=np.int16)
        for c in range(ch):
            blk[:, c] = np.asarray(chans[c][:n], dtype=np.int16)
        out_blocks.append(blk)
    if not out_blocks:
        raise ValueError("no complete IMA ADPCM block")
    return np.concatenate(out_blocks, axis=0)


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


def _ms_adpcm_decode(payload: bytes, ch: int, block_align: int) -> np.ndarray:
    """MS-ADPCM data chunk -> interleaved int16 samples (n, ch).
    Block layout per channel: predictor index byte, int16 initial
    delta, int16 sample1, int16 sample2; then 4-bit nibbles,
    channel-interleaved."""
    header = 7 * ch
    if block_align <= header:
        raise ValueError(f"bad MS-ADPCM block align {block_align}")
    out_blocks = []
    for off in range(0, len(payload) - block_align + 1, block_align):
        block = payload[off:off + block_align]
        preds = [block[c] for c in range(ch)]
        if any(p >= len(_MS_COEFS) for p in preds):
            raise ValueError("MS-ADPCM predictor index out of range")
        deltas = [struct.unpack_from("<h", block, ch + 2 * c)[0]
                  for c in range(ch)]
        s1 = [struct.unpack_from("<h", block, 3 * ch + 2 * c)[0]
              for c in range(ch)]
        s2 = [struct.unpack_from("<h", block, 5 * ch + 2 * c)[0]
              for c in range(ch)]
        chans = [[s2[c], s1[c]] for c in range(ch)]
        c = 0
        for byte in block[header:]:
            for nib in (byte >> 4, byte & 0x0F):     # high nibble first
                signed = nib - 16 if nib >= 8 else nib
                co = _MS_COEFS[preds[c]]
                pred = (chans[c][-1] * int(co[0])
                        + chans[c][-2] * int(co[1])) >> 8
                sample = min(32767, max(-32768, pred + signed * deltas[c]))
                chans[c].append(int(sample))
                deltas[c] = max(16, (int(_MS_ADAPT[nib]) * deltas[c]) >> 8)
                c = (c + 1) % ch
        n = len(chans[0])
        blk = np.empty((n, ch), dtype=np.int16)
        for k in range(ch):
            blk[:, k] = np.asarray(chans[k][:n], dtype=np.int16)
        out_blocks.append(blk)
    if not out_blocks:
        raise ValueError("no complete MS-ADPCM block")
    return np.concatenate(out_blocks, axis=0)


def encode_wav_ima_adpcm(samples: np.ndarray, sample_rate: int = 8_000,
                         block_samples: int = 505) -> bytes:
    """Fixture-grade IMA ADPCM encoder (mono): float samples in
    [-1, 1] -> RIFF/WAVE format 0x11 bytes, standard block layout."""
    arr = np.asarray(samples, dtype=np.float64).ravel()
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(np.int32)
    block_align = 4 + (block_samples - 1 + 7) // 8 * 4
    data_words = (block_align - 4) // 4
    blocks = bytearray()
    pred = 0
    idx = 0
    i = 0
    n = len(pcm)
    while i < n:
        chunk = pcm[i:i + block_samples]
        i += block_samples
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = pred - d if nib & 8 else pred + d
            pred = min(32767, max(-32768, pred))
            idx = min(88, max(0, idx + int(_IMA_INDEX_TABLE[nib & 7])))
            nibbles.append(nib)
        while len(nibbles) < data_words * 8:
            nibbles.append(0)
        for k in range(0, len(nibbles), 2):
            blocks.append(nibbles[k] | (nibbles[k + 1] << 4))
    payload = bytes(blocks)
    fmt = struct.pack("<HHIIHH", 0x11, 1, sample_rate,
                      sample_rate * block_align // block_samples,
                      block_align, 4)
    out = bytearray(b"RIFF")
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return bytes(out)


@clean_errors
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
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
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
    elif audio_format == 7 and bits == 8:      # G.711 mu-law
        samples = (_mulaw_decode_table()[np.frombuffer(payload, dtype=np.uint8)]
                   .astype(np.float64) / 32768.0)
    elif audio_format == 6 and bits == 8:      # G.711 A-law
        samples = (_alaw_decode_table()[np.frombuffer(payload, dtype=np.uint8)]
                   .astype(np.float64) / 32768.0)
    elif audio_format == 0x11 and bits == 4:   # IMA ADPCM
        pcm = _ima_adpcm_decode(payload, ch, block_align)
        return pcm.astype(np.float64) / 32768.0, rate
    elif audio_format == 2 and bits == 4:      # MS-ADPCM
        pcm = _ms_adpcm_decode(payload, ch, block_align)
        return pcm.astype(np.float64) / 32768.0, rate
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit not supported "
            "(PCM 8/16/32, float32, A-law, mu-law, IMA/MS ADPCM only)")
    frames = len(samples) // ch
    if frames > _MAX_FRAMES:
        raise ValueError(f"{frames} frames exceeds decoder cap")
    return samples[: frames * ch].reshape(frames, ch), rate
