"""Pure-stdlib PNG codec (zlib inflate + numpy unfilter).

The container ships no image libraries, but PNG needs none: the format
is zlib-compressed scanlines behind a 4-filter predictor (PNG spec,
RFC 2083 / W3C PNG 2nd ed. §9). This module implements:

  decode_png(data) -> (h, w, c) uint8 array
      chunk walk (IHDR / PLTE / tRNS / IDAT / IEND), zlib inflate of the
      concatenated IDAT stream, per-scanline unfilter (None / Sub / Up /
      Average / Paeth), gray / RGB / palette / gray+alpha / RGBA at all
      spec depths (1/2/4/8/16-bit; 16-bit keeps the high byte, sub-byte
      gray scales to full range), Adam7 interlace de-interlaced (round
      5). Palette images are expanded to RGB(A).

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


# valid bit depths per color type (PNG spec table 11.1)
_VALID_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8},
                 4: {8, 16}, 6: {8, 16}}

# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _unfilter(raw: np.ndarray, height: int, stride: int, step: int) -> np.ndarray:
    """(h, stride+1) filtered scanline bytes -> (h, stride) recon bytes.
    `step` is the filter's left-byte offset (bpp in BYTES, min 1 —
    sub-byte depths filter at byte granularity per spec)."""
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
            # recon[x] = raw[x] + recon[x-step]: strided cumulative sum
            # (int64 accumulator — int16 cumsum would wrap mid-row)
            for c in range(step):
                rec[c::step] = (np.cumsum(rec[c::step], dtype=np.int64)
                                & 0xFF).astype(np.int16)
        elif f == 3:                                 # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - step] if x >= step else 0
                rec[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:                                 # Paeth
            rec = row.copy()
            for x in range(stride):
                left = int(rec[x - step]) if x >= step else 0
                up = int(prior[x])
                ul = int(prior[x - step]) if x >= step else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid filter type {f} on scanline {y}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def _unpack_samples(rows: np.ndarray, width: int, ch: int,
                    depth: int) -> np.ndarray:
    """(h, stride) recon bytes -> (h, width, ch) uint8 samples.
    Depth 16 keeps the HIGH byte (8-bit downscale, the standard
    preview reduction); depths 1/2/4 unpack MSB-first and gray scales
    to full range (palette indices stay raw)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * ch].reshape(h, width, ch)
    if depth == 16:
        return rows[:, : width * ch * 2].reshape(h, width, ch, 2)[..., 0]
    # sub-byte: single-channel only (gray or palette indices)
    bits = np.unpackbits(rows, axis=1)
    per = 8 // depth
    vals = np.zeros((h, rows.shape[1] * per), dtype=np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[:, k::depth][:, : vals.shape[1]]
    return vals[:, :width].reshape(h, width, 1)


@clean_errors
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. Palette expands to RGB(A);
    16-bit samples downscale to their high byte; 1/2/4-bit gray scales
    to full 0-255 range; Adam7 interlace is de-interlaced."""
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
            if interlace not in (0, 1):
                raise ValueError(f"invalid interlace method {interlace}")
            if color_type not in _CHANNELS:
                raise ValueError(f"invalid color type {color_type}")
            if bit_depth not in _VALID_DEPTHS[color_type]:
                raise ValueError(
                    f"bit depth {bit_depth} invalid for color type {color_type}")
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

    step = max(1, ch * bit_depth // 8)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    img = np.zeros((height, width, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * ch * bit_depth + 7) // 8
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("IDAT length mismatch")
        sub = np.frombuffer(raw[pos:pos + need],
                            dtype=np.uint8).reshape(ph, stride + 1)
        pos += need
        recon = _unfilter(sub, ph, stride, step)
        samples = _unpack_samples(recon, pw, ch, bit_depth)
        img[np.ix_(y0 + dy * np.arange(ph), x0 + dx * np.arange(pw))] = samples
    if pos != len(raw):
        raise ValueError("IDAT length mismatch")
    if color_type == 0 and bit_depth in (1, 2, 4):
        img = (img.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)
               ).astype(np.uint8)
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
