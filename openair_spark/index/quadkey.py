"""Quadtree cells over lon/lat in pure floor arithmetic.

This is the engine's *oracle-checkable* index: the same cell id is
expressible in ANSI SQL (DuckDB) as floor arithmetic, so every join
that keys on it can be verified row-for-row by the driver's oracle.

cell id at resolution r (0 <= r <= 26):
    nx = floor((lon + 180) / 360 * 2^r)  clamped to [0, 2^r - 1]
    ny = floor((lat + 90) / 180 * 2^r)   clamped
    id = r * 2^54 + ny * 2^27 + nx       (fits in a signed 64-bit long)

SQL equivalent (documented for oracle_sql):
    r*CAST(2 AS BIGINT)**54 + ny*2**27 + nx with the same floor/clamp.

Resolutions 5-9 give ~700 km .. ~40 km cells at the equator — the same
operating range the north rule asks of H3 res 5-9 covers.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = 54
_Y_SHIFT = 27
_MASK = (1 << _Y_SHIFT) - 1


def cell_id(lat, lon, res: int):
    n = 1 << res
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    ny = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return (np.int64(res) << np.int64(_RES_SHIFT)) + (ny << np.int64(_Y_SHIFT)) + nx


def decode(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    rem = cell - (res << np.int64(_RES_SHIFT))
    ny = rem >> _Y_SHIFT
    nx = rem - (ny << np.int64(_Y_SHIFT))
    return res, nx, ny


def cell_bounds(cell):
    """(west, south, east, north) of a cell (scalars or arrays)."""
    res, nx, ny = decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    west = nx / n * 360.0 - 180.0
    east = (nx + 1) / n * 360.0 - 180.0
    south = ny / n * 180.0 - 90.0
    north = (ny + 1) / n * 180.0 - 90.0
    return west, south, east, north


def children(cell) -> list:
    res, nx, ny = (int(v) for v in decode(cell))
    out = []
    for dy in (0, 1):
        for dx in (0, 1):
            cx, cy = 2 * nx + dx, 2 * ny + dy
            out.append(((res + 1) << _RES_SHIFT) + (cy << _Y_SHIFT) + cx)
    return out


def parent(cell, res: int):
    r, nx, ny = decode(cell)
    shift = (r - res).astype(np.int64) if hasattr(r - res, "astype") else int(r - res)
    return (np.int64(res) << np.int64(_RES_SHIFT)) + ((ny >> shift) << np.int64(_Y_SHIFT)) + (nx >> shift)


def neighbors(cell, rings: int = 1) -> list:
    """Cells within `rings` Chebyshev distance (clamped at poles,
    wrapped in longitude)."""
    res, nx, ny = (int(v) for v in decode(cell))
    n = 1 << res
    out = []
    for dy in range(-rings, rings + 1):
        for dx in range(-rings, rings + 1):
            cy = ny + dy
            if cy < 0 or cy >= n:
                continue
            cx = (nx + dx) % n
            out.append((res << _RES_SHIFT) + (cy << _Y_SHIFT) + cx)
    return out


def sql_cell_expr(lat_col: str, lon_col: str, res: int) -> str:
    """ANSI-SQL (DuckDB + Spark SQL) expression computing cell_id —
    keeps Spark and the oracle bit-identical."""
    n = 1 << res
    return (
        f"(CAST({res} AS BIGINT) * {1 << _RES_SHIFT}"
        f" + LEAST(GREATEST(CAST(FLOOR(({lat_col} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
        f" * {1 << _Y_SHIFT}"
        f" + LEAST(GREATEST(CAST(FLOOR(({lon_col} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}))"
    )
