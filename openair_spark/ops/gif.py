"""From-scratch GIF87a/89a codec — stdlib + numpy.

Third real image lane (after ops/png.py and ops/jpeg.py), built from
the public GIF89a specification: LZW decompression with variable code
width and dictionary reset, global/local color tables, interlacing,
multi-frame animations with graphic-control disposal and transparency.
GIF is a top crawl image format, so the multimodal surface should not
stub it.

  decode_gif : frames as (h, w, 4) RGBA uint8 (full logical screen,
               composited per the disposal method) + per-frame delay
  encode_gif : frames (RGB or RGBA) -> animated (or single-frame) GIF
               with a real LZW encoder (dictionary to 4096, standard
               clear/EOI handling), global 256-color table built by
               exact-color indexing (raises if a frame exceeds 256
               distinct colors — fixtures are synthetic, no dithering
               claim)

Scope honesty: the encoder is fixture-grade (exact-palette only); the
decoder covers the full baseline format. Corrupt input raises
ValueError; plain-text/unknown extensions are skipped per spec. The
LZW layer is pinned by a hand-built bitstream fixture in
tests/test_gif.py so an encoder/decoder table typo cannot cancel.
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

_MAX_PIXELS = 64_000_000
_MAX_FRAMES = 10_000


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------ LZW


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable width (min+1 .. 12 bits, LSB-first),
    CLEAR resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    buf = bytearray()

    def expand(code: int) -> bytes:
        nonlocal buf
        buf.clear()
        while code >= clear:
            buf.append(suffix[code])
            code = prefix[code]
        buf.append(code)
        return bytes(reversed(buf))

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("first LZW code not a root")
            seq = bytes([code])
        elif code < next_code:
            seq = expand(code)
        elif code == next_code:
            head = expand(prev)
            seq = head + head[:1]
        else:
            raise ValueError("LZW code beyond dictionary")
        first = seq[0]
        if n_out + len(seq) > n_pixels:
            seq = seq[: n_pixels - n_out]
        if seq:
            out[n_out:n_out + len(seq)] = np.frombuffer(seq, dtype=np.uint8)
            n_out += len(seq)
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first  # first byte of current sequence
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out >= n_pixels:
            # consume until EOI or end of data (tolerant)
            break
    if n_out < n_pixels:
        raise ValueError(f"LZW produced {n_out}/{n_pixels} pixels")
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder (dict to 4096 then CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    seq = b""
    for v in indices.tobytes():
        cand = seq + bytes([v])
        if cand in table:
            seq = cand
            continue
        put(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([v])
    if seq:
        put(table[seq])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoder

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


@clean_errors
def decode_gif(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF bytes -> ([(h, w, 4) RGBA frames on the logical screen],
    [per-frame delay in 10ms units])."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated header")
    w, h, flags, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad logical screen {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    canvas = np.zeros((h, w, 4), dtype=np.uint8)  # transparent screen
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = -1
    disposal = 0
    delay = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("unterminated sub-block chain")
            n = data[p]
            p += 1
            if n == 0:
                break
            chunks.append(data[p:p + n])
            if len(chunks[-1]) != n:
                raise ValueError("truncated sub-block")
            p += n
        return b"".join(chunks), p

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gflags, delay = body[0], struct.unpack("<H", body[1:3])[0]
                disposal = (gflags >> 2) & 0x07
                transparent = body[3] if gflags & 0x01 else -1
        elif block == 0x2C:  # image descriptor
            if len(frames) >= _MAX_FRAMES:
                raise ValueError("frame count exceeds decoder cap")
            ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
            pos += 9
            if ix + iw > w or iy + ih > h or iw == 0 or ih == 0:
                raise ValueError("image descriptor outside logical screen")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                if len(pal) != n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table for frame")
            min_code = data[pos]
            pos += 1
            if not (2 <= min_code <= 11):
                raise ValueError(f"bad LZW min code size {min_code}")
            stream, pos = read_subblocks(pos)
            idx = lzw_decode(stream, min_code, iw * ih)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("pixel index beyond color table")
            if iflags & 0x40:  # interlaced: produced rows are in 4-pass
                # order; src[display_row] = produced_row index
                src = np.empty(ih, dtype=np.int64)
                r = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        src[y] = r
                        r += 1
                idx = idx.reshape(ih, iw)[src]
            else:
                idx = idx.reshape(ih, iw)
            prev_region = canvas[iy:iy + ih, ix:ix + iw].copy()
            rgba = np.dstack([pal[idx], np.full((ih, iw), 255, dtype=np.uint8)])
            if transparent >= 0:
                mask = idx == transparent
                rgba[mask] = canvas[iy:iy + ih, ix:ix + iw][mask]
            canvas[iy:iy + ih, ix:ix + iw] = rgba
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:       # restore to background (transparent)
                canvas[iy:iy + ih, ix:ix + iw] = 0
            elif disposal == 3:     # restore to previous
                canvas[iy:iy + ih, ix:ix + iw] = prev_region
            transparent = -1
            disposal = 0
            delay = 0
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return frames, delays


# ------------------------------------------------------------- encoder


def encode_gif(frames, delays=None, loop: bool = True) -> bytes:
    """uint8 RGB(A) frames (same (h, w)) -> GIF89a bytes. Builds one
    global exact-color palette over all frames (<= 256 distinct colors
    required — fixture-grade, no quantization claim)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    rgb_frames = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.dstack([f, f, f])
        if f.shape[2] == 4:
            f = f[:, :, :3]
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        rgb_frames.append(f)
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in rgb_frames]), axis=0)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors > 256 "
                         "(exact-palette encoder)")
    # color -> index lookup
    keys = (colors[:, 0].astype(np.int64) << 16) | \
           (colors[:, 1].astype(np.int64) << 8) | colors[:, 2]
    lut = {int(k): i for i, k in enumerate(keys)}
    gct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    min_code = max(2, gct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7), 0, 0)
    out += table.tobytes()
    if loop and len(rgb_frames) > 1:  # Netscape looping extension
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    delays = delays or [10] * len(rgb_frames)
    for f, d in zip(rgb_frames, delays):
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, d, 0) + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        fk = (f[:, :, 0].astype(np.int64) << 16) | \
             (f[:, :, 1].astype(np.int64) << 8) | f[:, :, 2].astype(np.int64)
        idx = np.vectorize(lut.__getitem__, otypes=[np.uint8])(fk.ravel())
        out += bytes([min_code])
        stream = lzw_encode(idx, min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
