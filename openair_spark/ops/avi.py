"""From-scratch MJPEG-in-AVI (RIFF) video container — stdlib + numpy.

Makes the VIDEO lane of the multimodal surface real for the simplest
widely-used container/codec pair: AVI is RIFF (the same chunk grammar
ops/wav.py walks) and Motion-JPEG frames are plain baseline JPEGs
(decoded by ops/jpeg.py). Container layout per the public Microsoft
AVI RIFF spec:

  RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf'))
             LIST('movi' '00dc'* ) 'idx1')

The decoder walks LIST chunks recursively, collects '00dc'/'00db'
stream-0 frame chunks from 'movi', and hands each to decode_jpeg;
'avih' supplies fps and declared dims. Non-MJPG streams raise
NotImplementedError; corrupt containers raise ValueError (same
contract as the other codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from ._codec_common import clean_errors

from .jpeg import decode_jpeg, encode_jpeg, is_jpeg

_MAX_FRAMES = 100_000


def is_avi(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"AVI ")


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """uint8 RGB frames (all same (h, w, 3)) -> MJPEG AVI bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        payloads.append(encode_jpeg(f, quality=quality, subsampling="4:2:0"))
    max_bytes = max(len(p) for p in payloads)
    n = len(frames)

    avih = struct.pack("<IIIIIIIIII", 1_000_000 // fps, max_bytes * fps, 0,
                       0x10,  # AVIF_HASINDEX
                       n, 0, 1, max_bytes, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                          1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = bytearray()
    index = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the start of 'movi' list data
        index += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = _chunk(b"idx1", bytes(index))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


@clean_errors
def decode_mjpeg_avi(data: bytes) -> tuple[list[np.ndarray], int]:
    """MJPEG AVI bytes -> (RGB frames, fps)."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/'AVI ' header)")
    fps = 0
    frames: list[np.ndarray] = []

    def walk(buf: bytes, start: int, end: int, in_movi: bool) -> None:
        nonlocal fps
        pos = start
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            (clen,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            if body_start + clen > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                ltype = buf[body_start:body_start + 4]
                walk(buf, body_start + 4, body_start + clen,
                     in_movi or ltype == b"movi")
            elif cid == b"avih":
                if clen < 4:
                    raise ValueError("short avih")
                (usec,) = struct.unpack("<I", buf[body_start:body_start + 4])
                fps = round(1_000_000 / usec) if usec else 0
            elif in_movi and cid in (b"00dc", b"00db") and clen > 0:
                payload = buf[body_start:body_start + clen]
                if not is_jpeg(payload):
                    raise NotImplementedError(
                        "non-MJPEG stream payload (only Motion-JPEG AVIs "
                        "are decodable here)")
                if len(frames) >= _MAX_FRAMES:
                    raise ValueError("frame count exceeds decoder cap")
                frames.append(decode_jpeg(payload))
            pos = body_start + clen + (clen & 1)

    (riff_len,) = struct.unpack("<I", data[4:8])
    walk(data, 12, min(len(data), 8 + riff_len), False)
    if not frames:
        raise ValueError("no video frames found")
    return frames, fps
