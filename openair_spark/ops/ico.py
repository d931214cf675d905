"""ICO (favicon) container — stdlib struct, reusing ops/bmp + ops/png.

Favicons are among the most common binary payloads in a web crawl. An
ICO file is a directory of images, each entry either a PNG (modern) or
a headerless BMP DIB with doubled height (pixels + AND transparency
mask). This module walks the public ICONDIR layout and decodes every
entry via the existing from-scratch codecs; the DIB branch rebuilds a
BITMAPFILEHEADER so ops/bmp does the pixel work, then applies the AND
mask as alpha for 1/4/8/24-bit entries (32-bit entries carry their own
alpha channel).

decode_ico -> list of (h, w, 4) RGBA uint8 frames, largest first.
Corrupt input raises ValueError (shared codec contract).
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors
from .bmp import decode_bmp
from .png import decode_png, is_png

_MAX_ENTRIES = 64


def is_ico(data: bytes) -> bool:
    return (len(data) >= 6 and data[:4] == b"\x00\x00\x01\x00"
            and 0 < struct.unpack("<H", data[4:6])[0] <= _MAX_ENTRIES)


@clean_errors
def decode_ico(data: bytes) -> list[np.ndarray]:
    """ICO bytes -> [(h, w, 4) RGBA uint8, ...] sorted largest-first."""
    if not is_ico(data):
        raise ValueError("not an ICO (bad ICONDIR header)")
    (n,) = struct.unpack("<H", data[4:6])
    frames: list[np.ndarray] = []
    for k in range(n):
        off = 6 + 16 * k
        entry = data[off:off + 16]
        if len(entry) != 16:
            raise ValueError("truncated ICONDIRENTRY")
        w, h, _pal, _r, _planes, _bpp, size, img_off = struct.unpack(
            "<BBBBHHII", entry)
        w = w or 256
        h = h or 256
        payload = data[img_off:img_off + size]
        if len(payload) != size:
            raise ValueError("truncated ICO image data")
        if is_png(payload):
            img = decode_png(payload)
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            if img.shape[2] == 3:
                img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
            frames.append(img)
            continue
        # headerless DIB: biHeight is DOUBLED (XOR pixels + AND mask)
        if len(payload) < 40:
            raise ValueError("truncated ICO DIB header")
        hdr_size, bw, bh2 = struct.unpack("<Iii", payload[:12])
        bpp = struct.unpack("<H", payload[14:16])[0]
        bh = bh2 // 2
        if bw != w or bh != h:
            # trust the DIB, not the (byte-limited) directory entry
            w, h = bw, bh
        # rebuild a standalone BMP for the XOR image: patch height to
        # the real pixel height and prepend a file header
        n_colors = struct.unpack("<I", payload[32:36])[0]
        if n_colors == 0 and bpp <= 8:
            n_colors = 1 << bpp
        pal_bytes = 4 * n_colors if bpp <= 8 else 0
        xor_stride = (w * bpp + 31) // 32 * 4
        xor_size = xor_stride * h
        body = bytearray(payload)
        struct.pack_into("<i", body, 8, h)          # un-double the height
        pix_off = 14 + hdr_size + pal_bytes
        bmp = (struct.pack("<2sIHHI", b"BM", 14 + len(body), 0, 0, pix_off)
               + bytes(body[: hdr_size + pal_bytes + xor_size]))
        img = decode_bmp(bmp)
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        if bpp < 32:
            # AND mask: 1-bit rows padded to 32 bits, bottom-up
            mask_off = hdr_size + pal_bytes + xor_size
            mask_stride = (w + 31) // 32 * 4
            mask = payload[mask_off:mask_off + mask_stride * h]
            if len(mask) == mask_stride * h:
                bits = np.unpackbits(
                    np.frombuffer(mask, dtype=np.uint8).reshape(h, mask_stride),
                    axis=1)[:, :w][::-1]            # bottom-up like the DIB
                img = img.copy()
                img[:, :, 3] = np.where(bits == 1, 0, img[:, :, 3])
        frames.append(img)
    if not frames:
        raise ValueError("no images in ICO")
    frames.sort(key=lambda f: f.shape[0] * f.shape[1], reverse=True)
    return frames


def encode_ico(images: list[np.ndarray]) -> bytes:
    """Fixture-grade encoder: each uint8 RGB(A) image stored as a PNG
    entry (the modern favicon form)."""
    from .png import encode_png

    if not images:
        raise ValueError("no images")
    if len(images) > _MAX_ENTRIES:
        raise ValueError("too many ICO entries")
    payloads = [encode_png(np.asarray(im, dtype=np.uint8)) for im in images]
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    img_off = 6 + 16 * len(images)
    for im, p in zip(images, payloads):
        h, w = np.asarray(im).shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO entries must be 1..256 px")
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                           len(p), img_off)
        img_off += len(p)
    for p in payloads:
        out += p
    return bytes(out)
