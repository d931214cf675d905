"""From-scratch baseline TIFF codec — stdlib struct + numpy.

TIFF 6.0 baseline from the public Adobe specification: both byte
orders (II/MM), IFD walk, strip assembly, and the three baseline
compressions — none (1), LZW (5, the TIFF variant: MSB-first bit
packing with EarlyChange, NOT the GIF LSB variant in ops/gif.py), and
PackBits (32773). Photometric 0/1 grayscale (white-is-zero inverted),
RGB(A), and palette (16-bit ColorMap scaled to 8-bit). 8-bit samples;
tiled TIFFs, 16-bit samples, JPEG-in-TIFF, and CCITT fax codings
raise NotImplementedError; corrupt input raises ValueError (the
shared codec contract).

The fixture-grade encoder emits little-endian single-strip files in
all three compressions so roundtrips exercise each decode path;
TIFF-LZW's EarlyChange and MSB packing are additionally pinned by a
hand-packed bitstream fixture in tests/test_tiff.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

_MAX_PIXELS = 64_000_000


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


# ----------------------------------------------------------- TIFF LZW


def tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, codes 256=CLEAR /
    257=EOI, width starts at 9 and increments at 510/1022/2046
    (EarlyChange: one code earlier than the table-full point)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream exhausted before EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first TIFF LZW code not a root")
            seq = table[code]
        elif code < len(table):
            seq = table[code]
        elif code == len(table):
            seq = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code beyond table")
        out += seq
        if len(out) > max_out:
            raise ValueError("TIFF LZW output exceeds strip size")
        if prev is not None:
            table.append(prev + seq[:1])
        # EarlyChange: the decoder's table lags the encoder's by one
        # entry, so widen when the NEXT slot reaches 2^w - 2 (one code
        # earlier than the table-full point — TIFF spec convention)
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        prev = seq
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (EarlyChange, MSB packing)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(CLEAR)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        put(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code + 1 >= (1 << width):   # EarlyChange on encode too
            if width < 12:
                width += 1
            else:
                put(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        seq = bytes([b])
    if seq:
        put(table[seq])
    put(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- PackBits


def packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:          # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("PackBits literal overruns input")
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:        # repeat next byte 257-h times
            if i >= n:
                raise ValueError("PackBits repeat overruns input")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
        if len(out) > max_out:
            raise ValueError("PackBits output exceeds strip size")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: repeat runs >= 3 as repeats, else literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        while i < n and (i - lit_start) < 128:
            nxt = 1
            while i + nxt < n and data[i + nxt] == data[i] and nxt < 3:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


# ------------------------------------------------------------- decoder


@clean_errors
def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w, channels) uint8 (palette expands to RGB)."""
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad byte-order header)")
    end = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(end + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated IFD offset")
    (n_entries,) = struct.unpack(end + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    _TYPE = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack(end + "HHI", data[off:off + 8])
        if typ not in _TYPE:
            continue  # rationals etc. — not needed for baseline decode
        fmt, sz = _TYPE[typ]
        total = sz * cnt
        if total <= 4:
            raw = data[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(end + "I", data[off + 8:off + 12])
            raw = data[voff:voff + total]
        if len(raw) != total:
            raise ValueError(f"truncated tag {tag}")
        tags[tag] = list(struct.unpack(end + fmt * cnt, raw))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad dimensions {w}x{h}")
    spp = one(277, 1)
    bps = tags.get(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"{bps}-bit samples (8-bit baseline only)")
    comp = one(259, 1)
    photo = one(262, 1)
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/inconsistent strip tables")
    rows_per_strip = one(278, h)
    stride = w * spp

    raw_rows = bytearray()
    for s_off, s_cnt in zip(offsets, counts):
        strip = data[s_off:s_off + s_cnt]
        if len(strip) != s_cnt:
            raise ValueError("truncated strip")
        n_rows = min(rows_per_strip, h - len(raw_rows) // stride)
        max_out = n_rows * stride
        if comp == 1:
            if len(strip) < max_out:
                raise ValueError("uncompressed strip too short")
            raw_rows += strip[:max_out]
        elif comp == 5:
            raw_rows += tiff_lzw_decode(strip, max_out)[:max_out]
        elif comp == 32773:
            raw_rows += packbits_decode(strip, max_out)[:max_out]
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} (none/LZW/PackBits only)")
    if len(raw_rows) < h * stride:
        raise ValueError("strip data shorter than image")
    img = np.frombuffer(bytes(raw_rows[: h * stride]),
                        dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:       # white-is-zero grayscale
        img = 255 - img
    elif photo == 3:     # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF without full ColorMap")
        pal = (np.asarray(cmap[: 3 * 256], dtype=np.uint32)
               .reshape(3, 256).T // 257).astype(np.uint8)
        img = pal[img[:, :, 0]]
    return np.ascontiguousarray(img)


# ------------------------------------------------------------- encoder


def encode_tiff(img: np.ndarray, compression: str = "none") -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA -> baseline
    little-endian single-strip TIFF. compression: 'none' | 'lzw' |
    'packbits'."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if img.size == 0:
        raise ValueError("empty image")
    payload = img.tobytes()
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp_code is None:
        raise ValueError(f"unknown compression {compression!r}")
    if comp_code == 5:
        payload = tiff_lzw_encode(payload)
    elif comp_code == 32773:
        payload = packbits_encode(payload)

    photo = 1 if spp == 1 else 2
    entries = []     # (tag, type, count, value_or_bytes)
    extra = bytearray()
    strip_pos_marker = len(entries)

    def short(tag, v):
        entries.append((tag, 3, 1, v))

    def long_(tag, v):
        entries.append((tag, 4, 1, v))

    short(256, w)
    short(257, h)
    if spp > 1:
        entries.append((258, 3, spp, [8] * spp))
    else:
        short(258, 8)
    short(259, comp_code)
    short(262, photo)
    long_(273, 0)              # strip offset patched below
    short(277, spp)
    short(278, h)
    long_(279, len(payload))

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    # lay out oversized value arrays between the IFD and the strip
    extra = bytearray()
    placed: dict[int, int] = {}
    for tag, typ, cnt, val in entries:
        if isinstance(val, list):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt > 4:
                placed[tag] = extra_off + len(extra)
                extra += struct.pack("<" + ("H" if typ == 3 else "I") * cnt, *val)
    data_off = extra_off + len(extra)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if isinstance(val, list):
            sz = {3: 2, 4: 4}[typ]
            if sz * cnt <= 4:
                packed = struct.pack("<" + ("H" if typ == 3 else "I") * cnt, *val)
                packed += b"\x00" * (4 - len(packed))
                out += struct.pack("<HHI", tag, typ, cnt) + packed
            else:
                out += struct.pack("<HHII", tag, typ, cnt, placed[tag])
        else:
            if tag == 273:
                val = data_off
            if typ == 3:
                out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    assert len(out) == data_off, (len(out), data_off)
    out += payload
    return bytes(out)
