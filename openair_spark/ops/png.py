"""Pure-stdlib PNG codec (zlib inflate + numpy unfilter).

The container ships no image libraries, but PNG needs none: the format
is zlib-compressed scanlines behind a 4-filter predictor (PNG spec,
RFC 2083 / W3C PNG 2nd ed. §9). This module implements:

  decode_png(data) -> (h, w, c) uint8 array
      chunk walk (IHDR / PLTE / tRNS / IDAT / IEND), zlib inflate of the
      concatenated IDAT stream, per-scanline unfilter (None / Sub / Up /
      Average / Paeth), 8-bit gray / RGB / palette / gray+alpha / RGBA,
      non-interlaced. Palette images are expanded to RGB(A).

  encode_png(arr) -> bytes
      filter-0 scanlines + zlib, for (h, w) gray, (h, w, 3) RGB or
      (h, w, 4) RGBA uint8 input — used to synthesize the deterministic
      image assets of the multimodal pipeline (ops/multimodal.py).

Scale note: decode runs inside Arrow mapInPandas kernels; the sequential
part (Average/Paeth left-dependency) is per-scanline Python over numpy
rows, fine for the asset/thumbnail sizes a training pipeline decodes
executor-side. The reference repo has no multimodal surface — this is a
builder-brief component, not a parity one.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ._codec_common import clean_errors

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# allocation guard for hostile IHDR dimensions (64 MP ~ 256 MB RGBA)
_MAX_PIXELS = 64_000_000


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


@clean_errors
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. Palette expands to RGB(A)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    trns = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body))
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG not supported")
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} not supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"invalid color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("missing IHDR")
    # dimension sanity BEFORE the height*(stride+1) allocation: a hostile
    # IHDR must not drive a multi-GB numpy alloc or a zero-size reshape
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"image {width}x{height} exceeds decoder cap of {_MAX_PIXELS} pixels")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # keep the module's ValueError contract
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:].astype(np.int16)
    out = np.zeros((height, stride), dtype=np.int16)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        f = int(filters[y])
        row = scan[y]
        if f == 0:                                   # None
            rec = row.copy()
        elif f == 2:                                 # Up
            rec = (row + prior) & 0xFF
        elif f == 1:                                 # Sub
            rec = row.copy()
            # recon[x] = raw[x] + recon[x-ch]: strided cumulative sum
            # (int64 accumulator — int16 cumsum would wrap mid-row)
            for c in range(ch):
                rec[c::ch] = (np.cumsum(rec[c::ch], dtype=np.int64)
                              & 0xFF).astype(np.int16)
        elif f == 3:                                 # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:                                 # Paeth
            rec = row.copy()
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid filter type {f} on scanline {y}")
        out[y] = rec
        prior = rec
    img = out.astype(np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            if len(trns) > len(palette):
                raise ValueError("tRNS longer than PLTE")
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> PNG bytes
    (filter 0 scanlines, one zlib stream)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    return (_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
