"""H3-style aperture-7 hexagonal hierarchy (res 0-15, engine uses 5-9).

Hexagonal cells on an equirectangular (lon, lat-scaled) plane with the
aperture-7 parent/child relation used by H3: each finer resolution
shrinks cell area by 7x and rotates the lattice by atan(sqrt(3)/5)
(~19.1 deg), so a child hex is (approximately, as in real H3) contained
by its parent. Cell addressing is (res, q, r) axial coordinates packed
into a signed 64-bit id.

DIVERGENCE NOTE: ids are NOT interoperable with Uber H3 (bit-compatible
H3 needs the icosahedral gnomonic face tables; this container has no h3
lib to verify against). The algebra the engine needs — deterministic
point->cell at res 5-9, parent/child, k-ring neighbors, polygon covers —
matches H3's, and is property-tested in tests/test_index.py.

Base scale: res 0 hexagons have circumradius ~1107 km-equivalent in
degrees (matching H3 res-0 edge length ~1107 km), so res 5-9 cell sizes
track H3's (res 5 ~ 8.5 km edge, res 9 ~ 0.17 km edge at the equator).
"""

from __future__ import annotations

import math

import numpy as np

SQRT3 = math.sqrt(3.0)
# aperture-7 rotation: child lattice basis in parent axial coords
_APERTURE_ROT = math.atan2(SQRT3, 5.0)  # ~19.106 degrees
_SQRT7 = math.sqrt(7.0)

# res-0 hex circumradius in degrees (~1107 km / 111.32 km per degree)
_R0_DEG = 1107.0 / 111.32

_RES_SHIFT = 58
_Q_SHIFT = 29
_COORD_BIAS = 1 << 28  # axial coords packed biased-unsigned, 29 bits each


def _res_params(res: int) -> tuple[float, float]:
    """(circumradius_deg, lattice rotation) at `res`."""
    radius = _R0_DEG / (_SQRT7 ** res)
    rotation = (_APERTURE_ROT * res) % (2.0 * math.pi)
    return radius, rotation


def _plane(lat, lon):
    """Equirectangular plane: x = lon, y = lat (degrees). Deliberately
    simple & exactly invertible; distortion is the documented divergence
    from gnomonic H3."""
    return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)


def _axial_from_xy(x, y, res: int):
    """Point -> axial (q, r) via cube rounding on the rotated lattice."""
    radius, rot = _res_params(res)
    cos_r, sin_r = math.cos(-rot), math.sin(-rot)
    xr = x * cos_r - y * sin_r
    yr = x * sin_r + y * cos_r
    # pointy-top hex: q = (sqrt3/3 x - 1/3 y)/R, r = (2/3 y)/R
    qf = (SQRT3 / 3.0 * xr - yr / 3.0) / radius
    rf = (2.0 / 3.0 * yr) / radius
    return _cube_round(qf, rf)


def _cube_round(qf, rf):
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    q = np.where((dq > dr) & (dq > ds), -r - s, q)
    r = np.where(~((dq > dr) & (dq > ds)) & (dr > ds), -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _center_xy(q, r, res: int):
    radius, rot = _res_params(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    xr = radius * SQRT3 * (q + r / 2.0)
    yr = radius * 1.5 * r
    cos_r, sin_r = math.cos(rot), math.sin(rot)
    return xr * cos_r - yr * sin_r, xr * sin_r + yr * cos_r


def pack(res, q, r):
    q = np.asarray(q, dtype=np.int64) + _COORD_BIAS
    r = np.asarray(r, dtype=np.int64) + _COORD_BIAS
    return (np.int64(res) << np.int64(_RES_SHIFT)) | (q << np.int64(_Q_SHIFT)) | r


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _RES_SHIFT
    q = ((cell >> _Q_SHIFT) & np.int64((1 << 29) - 1)) - _COORD_BIAS
    r = (cell & np.int64((1 << 29) - 1)) - _COORD_BIAS
    return res.astype(np.int64), q, r


def cell_id(lat, lon, res: int):
    """Vectorized point -> hex cell id at `res`."""
    x, y = _plane(lat, lon)
    q, r = _axial_from_xy(x, y, res)
    return pack(res, q, r)


def cell_center(cell):
    res, q, r = unpack(cell)
    res_i = int(np.asarray(res).flat[0]) if np.asarray(res).size else 0
    x, y = _center_xy(q, r, res_i)
    return y, x  # (lat, lon)


def cell_boundary(cell) -> list:
    """6 vertices (lon, lat) of a scalar cell."""
    res, q, r = (int(np.asarray(v).item()) for v in unpack(cell))
    radius, rot = _res_params(res)
    cx, cy = _center_xy(q, r, res)
    cx, cy = float(cx), float(cy)
    out = []
    for k in range(6):
        ang = math.pi / 6.0 + k * math.pi / 3.0 + rot
        out.append([cx + radius * math.cos(ang), cy + radius * math.sin(ang)])
    return out


def parent(cell, parent_res: int):
    """Aperture-7 parent: the parent-res hex containing this center
    (H3's parent relation is the same center-containment rounding)."""
    res, q, r = unpack(cell)
    res_i = int(np.asarray(res).flat[0])
    x, y = _center_xy(q, r, res_i)
    pq, pr = _axial_from_xy(x, y, parent_res)
    return pack(parent_res, pq, pr)


def k_ring(cell, k: int = 1) -> list:
    """All cells within axial hex distance k (scalar cell)."""
    res, q, r = (int(np.asarray(v).item()) for v in unpack(cell))
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append(int(pack(res, q + dq, r + dr)))
    return out


def hex_distance(cell_a: int, cell_b: int) -> int:
    ra, qa, aa = (int(np.asarray(v).item()) for v in unpack(cell_a))
    rb, qb, ab = (int(np.asarray(v).item()) for v in unpack(cell_b))
    if ra != rb:
        raise ValueError("cells at different resolutions")
    dq, dr = qa - qb, aa - ab
    return int((abs(dq) + abs(dr) + abs(dq + dr)) // 2)
