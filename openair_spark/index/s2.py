"""S2 cell ids from scratch (published S2 geometry spec).

Pipeline: (lat, lon) -> unit XYZ -> cube face (largest |axis|) ->
face (u, v) -> quadratic ST transform -> leaf (i, j) at 2^30 ->
64-bit cell id via the face-interleaved Hilbert curve.

Everything is vectorized numpy (the point->cell path runs over billions
of rows inside pandas UDFs). The Hilbert traversal uses the canonical
per-level orientation automaton:

    position-in-curve for child (i,j) given orientation o:
        pos = IJ_TO_POS[o][2*i_bit + j_bit]
        o  ^= POS_TO_ORIENTATION[pos]

with SWAP=1, INVERT=2, POS_TO_ORIENTATION = [SWAP, 0, 0, INVERT|SWAP],
POS_TO_IJ = [[0,1,3,2],[0,2,3,1],[3,2,0,1],[3,1,0,2]].

Cell id layout (64 bits): 3 face bits, 2*level position bits, then a
trailing 1 "sentinel" bit, zero-padded.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

SWAP = 1
INVERT = 2
POS_TO_ORIENTATION = np.array([SWAP, 0, 0, INVERT | SWAP], dtype=np.int64)
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
# inverse: IJ_TO_POS[orientation][ij] -> position
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o][POS_TO_IJ[_o][_p]] = _p


def latlon_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return np.cos(lon) * cos_lat, np.sin(lon) * cos_lat, np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.select([face == 0, face == 1], [x, y], z) < 0, 3, 0
    )
    # (u, v) per face, spec axis conventions
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y / x, -x / y, -x / z, z / x, y / x],  # face 5 handled by default
        default=-y / z,
    )
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z / x, z / y, y / z, y / x, -z / y],
        default=-x / z,
    )
    return face.astype(np.int64), u, v


def uv_to_st(u):
    """Quadratic projection (the spec's recommended transform)."""
    u = np.asarray(u, dtype=np.float64)
    # clamp each branch's argument: np.where evaluates both branches
    # eagerly, and sqrt of the wrong-sign branch would warn on NaN
    pos = 0.5 * np.sqrt(1.0 + 3.0 * np.maximum(u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * np.minimum(u, 0.0))
    return np.where(u >= 0, pos, neg)


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s, level: int = MAX_LEVEL):
    n = 1 << level
    return np.clip((np.asarray(s) * n).astype(np.int64), 0, n - 1)


def face_ij_to_cell_id(face, i, j, level: int = MAX_LEVEL):
    """Hilbert-encode (face, i, j) at `level` into the 64-bit cell id."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orientation = face & SWAP
    pos = np.zeros_like(face, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        i_bit = (i >> k) & 1
        j_bit = (j >> k) & 1
        ij = 2 * i_bit + j_bit
        p = IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orientation = orientation ^ POS_TO_ORIENTATION[p]
    # layout: 3 face bits | 2*level pos bits | 1 sentinel | zeros
    shift = np.uint64(64 - 3 - 2 * level)
    cell = (face.astype(np.uint64) << np.uint64(61)) | (pos << shift)
    cell |= np.uint64(1) << np.uint64(64 - 3 - 2 * level - 1)
    return cell.astype(np.int64)  # two's complement; Spark LongType


def cell_id(lat_deg, lon_deg, level: int):
    """Vectorized (lat, lon) -> S2 cell id at `level`."""
    x, y, z = latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    return face_ij_to_cell_id(face, i, j, level)


def cell_level(cell) -> np.ndarray:
    """Level from the sentinel (lowest set) bit."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    # sentinel at bit b -> level = (61 - b) / 2
    b = np.zeros_like(c)
    tmp = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        b = np.where(mask, b + np.uint64(shift), b)
        tmp = np.where(mask, tmp >> np.uint64(shift), tmp)
    return ((np.uint64(61) - b) // np.uint64(2)).astype(np.int64)


def parent(cell, level: int):
    """Ancestor at `level` (spec: clear trailing bits, set new sentinel)."""
    c = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(64 - 3 - 2 * level - 1)
    return ((c & ~(new_lsb - np.uint64(1))) | new_lsb).astype(np.int64)


def cell_token(cell) -> str:
    """Canonical hex token of a scalar cell id."""
    return format(np.uint64(np.asarray(cell).item()), "016x").rstrip("0") or "0"
