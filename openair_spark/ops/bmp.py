"""From-scratch BMP (Windows DIB) codec — stdlib struct + numpy.

Completes the stock crawl-image matrix (PNG, JPEG, GIF, BMP; only WebP
stays gated). BMP is uncompressed, so the decoder is a header walk +
stride-aware reshape per the public BITMAPFILEHEADER/BITMAPINFOHEADER
layout: 8-bit paletted, 24-bit BGR, and 32-bit BGRA, bottom-up or
top-down (negative height), BI_RGB only. RLE/bitfield compression
raises NotImplementedError; corrupt input raises ValueError (the
shared codec contract).
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

_MAX_PIXELS = 64_000_000


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> 24-bit BI_RGB BMP bytes
    (bottom-up, rows padded to 4 bytes)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.dstack([img, img, img])
    if img.ndim != 3 or img.shape[2] != 3 or img.size == 0:
        raise ValueError("expected uint8 (h, w[, 3]) image")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    payload = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(payload), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload),
                       2835, 2835, 0, 0)
    return header + info + payload


@clean_errors
def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad 'BM' signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    _sig, _size, _r1, _r2, pix_off = struct.unpack("<2sIHHI", data[:14])
    hdr_size, w, h_signed, planes, bpp, compression = struct.unpack(
        "<IiiHHI", data[14:34])
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER (core) BMPs")
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (BI_RGB only)")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad dimensions {w}x{h_signed}")
    if bpp == 8:
        # palette: directly after the info header, BGRA quads
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data[pal_off:pal_off + 4 * n_colors],
                            dtype=np.uint8)
        if len(pal) != 4 * n_colors:
            raise ValueError("truncated palette")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        need = stride * h
        raw = np.frombuffer(data[pix_off:pix_off + need], dtype=np.uint8)
        if len(raw) != need:
            raise ValueError("truncated pixel data")
        idx = raw.reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("pixel index beyond palette")
        out = pal[idx]
    elif bpp in (24, 32):
        ch = bpp // 8
        stride = (w * ch + 3) & ~3
        need = stride * h
        raw = np.frombuffer(data[pix_off:pix_off + need], dtype=np.uint8)
        if len(raw) != need:
            raise ValueError("truncated pixel data")
        px = raw.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        out = px[:, :, 2::-1]  # BGR(A) -> RGB
    else:
        raise NotImplementedError(f"{bpp}-bit BMP")
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)
