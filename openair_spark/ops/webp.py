"""From-scratch WebP-lossless (VP8L) codec — stdlib + numpy.

Closes the LAST gated image format: built from the public WebP
Lossless Bitstream Specification (RFC 9649 / Google VP8L spec), the
same offline discipline as ops/png.py, ops/jpeg.py, ops/gif.py.

Decoder (`decode_webp`) covers the full lossless baseline:
  RIFF/WEBP container -> VP8L chunk -> LSB-first bitstream ->
  all four transforms (predictor with its 14 modes, color transform,
  subtract-green, color indexing incl. sub-byte pixel packing) ->
  meta-prefix groups, color cache, canonical prefix codes (simple and
  normal code-length-coded forms), LZ77 backward references with the
  2D distance-code neighborhood -> ARGB -> RGB(A).

Encoder (`encode_webp`) is fixture-grade but emits REAL spec-conform
streams: no transforms, no color cache, single prefix-code group,
literal-only coding with canonical per-channel Huffman codes
(length-limited to 15 bits) written through the 19-symbol
code-length code. Lossless, so roundtrips are exact.

Lossy WebP (VP8 chunk) raises NotImplementedError; corrupt input
raises ValueError (shared codec contract).

Offline verification note: no external .webp file exists in this
container, so in addition to exact roundtrips the bit-level
conventions (LSB-first packing, canonical code assignment read
MSB-of-code-first) are pinned by hand-built bitstream fixtures in
tests/test_webp.py derived from the spec text itself.
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

_MAX_PIXELS = 64_000_000

# code-length-code symbol order (spec section on normal prefix codes)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# distance-code -> (dx, dy) 2D neighborhood (first 120 codes). The spec
# lists the 120 (x, y) offsets explicitly; the listing is ordered by
# squared distance, then larger y first, then larger x first — verified
# against the spec's own leading sequence (0,1),(1,0),(1,1),(-1,1),
# (0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1),... which this key reproduces.
_cands = []
for _y in range(9):
    for _x in range(-8, 9):
        if _y == 0 and _x <= 0:
            continue
        _cands.append((_x, _y))
_cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
_DIST_MAP = _cands[:120]


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0      # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream exhausted")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ------------------------------------------------- canonical prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC1951-style canonical assignment: symbol -> (code, length),
    codes of equal length increase with symbol order."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for l, s in pairs:
        code <<= (l - prev_len)
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


class _PrefixCode:
    """Decode table: walk bits MSB-of-code-first (each stream bit
    appended as the next-lower significance of the code in progress)."""

    def __init__(self, lengths: list[int]) -> None:
        codes = _canonical_codes(lengths)
        if not codes:
            raise ValueError("empty prefix code")
        self.map = {(l, c): s for s, (c, l) in codes.items()}
        self.single = list(codes)[0] if len(codes) == 1 else None
        self.max_len = max(l for _c, l in codes.values())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _length_limit(hist: np.ndarray, limit: int = 15) -> list[int]:
    """Huffman code lengths from a histogram, capped at `limit` bits
    (package-merge-lite: build Huffman, then flatten overlong codes by
    incrementing shorter ones — adequate for fixture-grade encoding)."""
    nz = np.nonzero(hist)[0]
    if len(nz) == 0:
        return [0] * len(hist)
    if len(nz) == 1:
        out = [0] * len(hist)
        out[int(nz[0])] = 1
        return out
    import heapq

    heap = [(int(hist[s]), int(s), (int(s),)) for s in nz]
    heapq.heapify(heap)
    depth = {int(s): 0 for s in nz}
    while len(heap) > 1:
        f1, _t1, g1 = heapq.heappop(heap)
        f2, _t2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(_t1, _t2), g1 + g2))
    # enforce the limit (Kraft-repair)
    lens = sorted(((depth[s], s) for s in depth))
    lengths = [0] * len(hist)
    for l, s in lens:
        lengths[s] = min(l, limit)
    # repair Kraft sum if capping overflowed it
    def kraft(ls):
        return sum(2.0 ** -l for l in ls if l > 0)
    while kraft(lengths) > 1.0:
        # lengthen the shortest capped-at-<limit code
        cand = min((s for s in depth if lengths[s] < limit),
                   key=lambda s: lengths[s], default=None)
        if cand is None:
            raise ValueError("cannot satisfy length limit")
        lengths[cand] += 1
    return lengths


# ------------------------------------------------------------- decoder


def is_webp(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WEBP")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    simple = br.bits(1)
    if simple:
        n_syms = br.bits(1) + 1
        first_8 = br.bits(1)
        syms = [br.bits(8 if first_8 else 1)]
        if n_syms == 2:
            syms.append(br.bits(8))
        lengths = [0] * alphabet_size
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
        if n_syms == 1:
            lengths[syms[0]] = 1
        else:
            lengths[syms[0]] = 1
            lengths[syms[1]] = 1
        return _PrefixCode(lengths)
    # normal: code-length code
    n_clc = br.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _PrefixCode(clc_lengths)
    # optional max-symbol limit
    if br.bits(1):
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _PrefixCode(lengths)


def _lz77_extra(br: _BitReader, prefix_sym: int) -> int:
    """length/distance prefix symbol -> value (spec: 4 + extra bits)."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          allow_recursion: bool = True) -> np.ndarray:
    """Spatially-coded ARGB image (the recursive element used for
    entropy/transform/palette data and, at top level, the main image).
    Returns (h, w, 4) uint8 [A, R, G, B]."""
    use_cache = br.bits(1)
    cache_bits = 0
    cache = None
    if use_cache:
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color-cache bits {cache_bits}")
        cache = np.zeros((1 << cache_bits, 4), dtype=np.uint8)
    n_groups = 1
    meta = None
    meta_block_bits = 0
    if allow_recursion and br.bits(1):  # meta prefix codes
        meta_block_bits = br.bits(3) + 2
        mw = (w + (1 << meta_block_bits) - 1) >> meta_block_bits
        mh = (h + (1 << meta_block_bits) - 1) >> meta_block_bits
        meta_img = _decode_entropy_image(br, mw, mh, allow_recursion=False)
        meta = (meta_img[:, :, 1].astype(np.int32) << 8) | meta_img[:, :, 2]
        n_groups = int(meta.max()) + 1
    green_alpha = 256 + 24 + (1 << cache_bits if use_cache else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    out = np.zeros((h * w, 4), dtype=np.uint8)  # ARGB
    pos = 0
    total = h * w
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[y >> meta_block_bits, x >> meta_block_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.read(br)
        if s < 256:                       # literal: G, then R, B, A
            g = s
            r = rcode.read(br)
            b = bcode.read(br)
            a = acode.read(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                _cache_insert(cache, cache_bits, a, r, g, b)
            pos += 1
        elif s < 280:                     # LZ77 backref
            length = _lz77_extra(br, s - 256)
            dist_sym = dcode.read(br)
            dist_code = _lz77_extra(br, dist_sym)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= total:
                    raise ValueError("LZ77 run past image end")
                out[pos] = out[pos - dist]
                if cache is not None:
                    a_, r_, g_, b_ = out[pos]
                    _cache_insert(cache, cache_bits, a_, r_, g_, b_)
                pos += 1
        else:                             # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            idx = s - 280
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w, 4)


def _cache_insert(cache: np.ndarray, bits: int, a: int, r: int, g: int, b: int) -> None:
    argb = (a << 24) | (r << 16) | (g << 8) | b
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)
    cache[key] = (a, r, g, b)


def _apply_predictor_inverse(img: np.ndarray, modes: np.ndarray,
                             block_bits: int) -> None:
    """In-place inverse predictor transform. img is (h, w, 4) int ARGB."""
    h, w, _ = img.shape

    def avg2(p, q):
        return (p.astype(np.int32) + q.astype(np.int32)) // 2

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = img[y, x - 1].astype(np.int32)
            elif x == 0:
                pred = img[y - 1, x].astype(np.int32)
            else:
                mode = int(modes[y >> block_bits, x >> block_bits])
                L = img[y, x - 1].astype(np.int32)
                T = img[y - 1, x].astype(np.int32)
                TL = img[y - 1, x - 1].astype(np.int32)
                # rightmost column: per the VP8L row-buffer wrap the
                # TR pixel is the CURRENT row's leftmost (already
                # reconstructed), not the row above's (ADVICE r5)
                TR = (img[y - 1, x + 1].astype(np.int32) if x + 1 < w
                      else img[y, 0].astype(np.int32))
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:  # Select
                    pl = np.abs(T - TL).sum()
                    pt = np.abs(L - TL).sum()
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf
                    # C semantics truncate the /2 toward zero; Python's
                    # floor division differs on negative odd deltas
                    # (ADVICE r5)
                    av = avg2(L, T)
                    d = av - TL
                    pred = np.clip(av + np.sign(d) * (np.abs(d) // 2),
                                   0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            img[y, x] = (img[y, x].astype(np.int32) + pred) & 0xFF


def _apply_color_transform_inverse(img: np.ndarray, elems: np.ndarray,
                                   block_bits: int) -> None:
    """In-place inverse color transform. elems is the (bh, bw, 4) ARGB
    transform-element image (R=red_to_blue, G=green_to_blue,
    B=green_to_red per spec packing)."""
    h, w, _ = img.shape

    def to_i8(v):
        v = int(v) & 0xFF
        return v - 256 if v >= 128 else v

    def delta(t_signed, v_signed):
        return (to_i8(t_signed) * to_i8(v_signed)) >> 5

    for y in range(h):
        for x in range(w):
            e = elems[y >> block_bits, x >> block_bits]
            g2r = int(e[3])      # B channel: green_to_red
            g2b = int(e[2])      # G channel: green_to_blue
            r2b = int(e[1])      # R channel: red_to_blue
            a, r, g, b = (int(v) for v in img[y, x])
            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


@clean_errors
def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA (lossless VP8L only)."""
    if not is_webp(data):
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"VP8L":
            payload = body
            break
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) not supported — lossless VP8L only")
        pos += 8 + clen + (clen & 1)
    if payload is None:
        raise ValueError("no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    _alpha_hint = br.bits(1)
    version = br.bits(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version}")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"image {w}x{h} exceeds decoder cap")

    # transforms (applied in reverse order after decode)
    transforms = []
    xsize = w
    seen = set()
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:       # predictor
            bbits = br.bits(3) + 2
            bw = (xsize + (1 << bbits) - 1) >> bbits
            bh = (h + (1 << bbits) - 1) >> bbits
            sub = _decode_entropy_image(br, bw, bh, allow_recursion=False)
            transforms.append(("pred", bbits, sub[:, :, 2].copy()))  # green
        elif ttype == 1:     # color transform
            bbits = br.bits(3) + 2
            bw = (xsize + (1 << bbits) - 1) >> bbits
            bh = (h + (1 << bbits) - 1) >> bbits
            sub = _decode_entropy_image(br, bw, bh, allow_recursion=False)
            transforms.append(("color", bbits, sub))
        elif ttype == 2:     # subtract green
            transforms.append(("subgreen",))
        else:                # color indexing
            n_colors = br.bits(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1,
                                            allow_recursion=False)
            palette = pal_img[0].astype(np.int32)
            np.cumsum(palette, axis=0, out=palette)  # delta-coded
            palette &= 0xFF
            if n_colors <= 2:
                pack = 3
            elif n_colors <= 4:
                pack = 2
            elif n_colors <= 16:
                pack = 1
            else:
                pack = 0
            transforms.append(("palette", palette.astype(np.uint8), pack, xsize))
            xsize = (xsize + (1 << pack) - 1) >> pack

    img = _decode_entropy_image(br, xsize, h).astype(np.uint8)

    for t in reversed(transforms):
        if t[0] == "palette":
            _tag, palette, pack, full_w = t
            idx = img[:, :, 2].astype(np.int64)   # green channel
            if pack:
                per = 1 << pack
                bits_px = 8 >> pack
                cols = []
                for sub_i in range(per):
                    cols.append((idx >> (sub_i * bits_px))
                                & ((1 << bits_px) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)
            idx = idx[:, :full_w]
            if idx.max(initial=0) >= len(palette):
                raise ValueError("palette index out of range")
            img = palette[idx]
        elif t[0] == "subgreen":
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = ((img[:, :, 1].astype(np.int32) + g) & 0xFF)
            img[:, :, 3] = ((img[:, :, 3].astype(np.int32) + g) & 0xFF)
        elif t[0] == "color":
            _tag, bbits, sub = t
            _apply_color_transform_inverse(img, sub, bbits)
        elif t[0] == "pred":
            _tag, bbits, modes = t
            _apply_predictor_inverse(img, modes, bbits)

    # ARGB -> RGBA
    return np.ascontiguousarray(img[:, :, [1, 2, 3, 0]])


# ------------------------------------------------------------- encoder


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a prefix code: simple form for <=2 symbols, else the
    code-length-code normal form (no repeat codes — fixture-grade)."""
    syms = [s for s, l in enumerate(lengths) if l > 0]
    if len(syms) <= 2 and all(lengths[s] == 1 for s in syms) and \
            (len(syms) < 2 or syms[1] < 256):
        bw.write(1, 1)                       # simple
        bw.write(len(syms) - 1, 1)
        bw.write(1, 1)                       # first symbol in 8 bits
        bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)                           # normal
    # code lengths of the code-length code: support lengths 0..15 via a
    # CLC over used length values
    clc_hist = np.zeros(19, dtype=np.int64)
    for l in lengths:
        clc_hist[l] += 1
    clc_lengths = _length_limit(clc_hist, limit=7)
    # emit all 19 CLC lengths in the special order
    order_pos = {v: i for i, v in enumerate(_CLC_ORDER)}
    n_clc = max(order_pos[s] for s in range(19) if clc_lengths[s] > 0) + 1
    n_clc = max(n_clc, 4)
    bw.write(n_clc - 4, 4)
    for i in range(n_clc):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)                           # no max-symbol shortcut
    clc_codes = _canonical_codes(clc_lengths)
    if len(clc_codes) == 1:
        # single-used-symbol CLC (e.g. a perfectly uniform histogram
        # giving every alphabet symbol the same code length): the
        # decoder's _PrefixCode.single reads ZERO bits per length, so
        # emitting the 1-bit canonical code per length desyncs the
        # stream (ADVICE r5). Mirror the decoder and emit nothing —
        # it reconstructs every length from the CLC table alone.
        return
    for l in lengths:
        code, ln = clc_codes[l]
        # prefix codes are written MSB-of-code-first, one bit at a time
        for b in range(ln - 1, -1, -1):
            bw.write((code >> b) & 1, 1)


def encode_webp(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA -> lossless
    WebP bytes (VP8L, literal-only, single group, no transforms)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.dstack([img, img, img])
    if img.shape[2] == 3:
        img = np.dstack([img, np.full(img.shape[:2], 255, dtype=np.uint8)])
    if img.ndim != 3 or img.shape[2] != 4 or img.size == 0:
        raise ValueError("expected uint8 (h, w[, 3|4]) image")
    h, w = img.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (img[:, :, 3] != 255).any() else 0, 1)
    bw.write(0, 3)                           # version
    bw.write(0, 1)                           # no transform
    bw.write(0, 1)                           # no color cache
    bw.write(0, 1)                           # no meta prefix codes

    r = img[:, :, 0].ravel().astype(np.int64)
    g = img[:, :, 1].ravel().astype(np.int64)
    b = img[:, :, 2].ravel().astype(np.int64)
    a = img[:, :, 3].ravel().astype(np.int64)
    ghist = np.bincount(g, minlength=256 + 24)
    rhist = np.bincount(r, minlength=256)
    bhist = np.bincount(b, minlength=256)
    ahist = np.bincount(a, minlength=256)
    dhist = np.zeros(40, dtype=np.int64)
    dhist[0] = 1                              # unused but must be a valid code
    codes = []
    for hist in (ghist, rhist, bhist, ahist, dhist):
        lengths = _length_limit(hist.astype(np.int64))
        _write_prefix_code(bw, lengths)
        codes.append(_canonical_codes(lengths))
    gcodes, rcodes, bcodes, acodes, _d = codes

    def put(codebook, sym):
        if len(codebook) == 1:
            return  # single-symbol code costs zero bits on read
        code, ln = codebook[int(sym)]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)

    for i in range(h * w):
        put(gcodes, g[i])
        put(rcodes, r[i])
        put(bcodes, b[i])
        put(acodes, a[i])

    payload = b"\x2F" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
