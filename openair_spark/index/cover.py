"""Compact polygon covers (north rule: "tiles polygons into H3 (res 5-9)
+ S2 cells with a compact cover").

Algorithm (index-agnostic): seed with every cell whose bbox intersects
the polygon bbox at `min_res`; classify each cell FULL-INSIDE /
PARTIAL / OUTSIDE against the ring (vectorized PIP on cell corners +
edge-crossing test); keep FULL cells at their resolution (compactness),
refine PARTIAL cells to children until `max_res`, keep PARTIAL leaves.

This is also the mega-polygon splitting mechanism (north rule skew
handling): a FIR-sized ring yields many bounded cells instead of one
giant join row, and each PARTIAL leaf carries only the bbox-clipped
candidate status, so per-cell work is bounded.
"""

from __future__ import annotations

import numpy as np

from . import quadkey
from .pip import points_in_ring


def _ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    return float(ring[:, 0].min()), float(ring[:, 1].min()), float(ring[:, 0].max()), float(ring[:, 1].max())


OUTSIDE, PARTIAL, FULL = 0, 1, 2


def classify_cells(cells: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized FULL/PARTIAL/OUTSIDE classification of quadkey cells
    against a closed lon/lat ring — one numpy pass for a whole cover
    frontier instead of per-cell Python.

    boundary-in-cell := any ring vertex inside the cell bbox, or any
    ring edge strictly crossing a bbox edge. No boundary + all corners
    inside -> FULL; none inside -> OUTSIDE; mixed corner verdicts with
    no detected boundary only happen when the ring grazes a cell edge
    exactly (strict crossing test + half-open corner PIP) -> PARTIAL so
    the cover stays a superset."""
    cells = np.asarray(cells, dtype=np.int64)
    m = len(cells)
    res = cells >> quadkey._RES_SHIFT
    y = (cells >> quadkey._Y_SHIFT) & quadkey._MASK
    x = cells & quadkey._MASK
    n = (1 << res).astype(np.float64)
    west = -180.0 + x * 360.0 / n
    east = -180.0 + (x + 1) * 360.0 / n
    south = -90.0 + y * 180.0 / n
    north = -90.0 + (y + 1) * 180.0 / n

    vx, vy = ring[:, 0], ring[:, 1]
    # (m,) any ring vertex inside each bbox
    vert_in = (
        (vx[None, :] >= west[:, None]) & (vx[None, :] <= east[:, None])
        & (vy[None, :] >= south[:, None]) & (vy[None, :] <= north[:, None])
    ).any(axis=1)

    x1, y1 = vx[:-1], vy[:-1]
    x2, y2 = vx[1:], vy[1:]
    crossing = np.zeros(m, dtype=bool)
    # a STRICT crossing of a cell edge implies the intersection point
    # lies in both closed bboxes, so restricting the 4-edge orientation
    # tests to bbox-overlapping (cell, segment) pairs is exact — and
    # turns the previous 16-orientation dense (m, n) evaluation into a
    # cheap 4-comparison mask plus elementwise tests on the few
    # surviving pairs (the cover classifier's hottest lines).
    sxmin, sxmax = np.minimum(x1, x2), np.maximum(x1, x2)
    symin, symax = np.minimum(y1, y2), np.maximum(y1, y2)
    overlap = ((sxmin[None, :] <= east[:, None]) & (sxmax[None, :] >= west[:, None])
               & (symin[None, :] <= north[:, None]) & (symax[None, :] >= south[:, None]))
    ci, sj = np.nonzero(overlap)
    if len(ci):
        px1, py1, px2, py2 = x1[sj], y1[sj], x2[sj], y2[sj]
        pdx, pdy = px2 - px1, py2 - py1
        hit = np.zeros(len(ci), dtype=bool)
        for ax, ay, bx, by in (
            (west, south, east, south), (east, south, east, north),
            (east, north, west, north), (west, north, west, south),
        ):
            eax, eay, ebx, eby = ax[ci], ay[ci], bx[ci], by[ci]
            edx, edy = ebx - eax, eby - eay
            d1 = edx * (py1 - eay) - edy * (px1 - eax)
            d2 = edx * (py2 - eay) - edy * (px2 - eax)
            d3 = pdx * (eay - py1) - pdy * (eax - px1)
            d4 = pdx * (eby - py1) - pdy * (ebx - px1)
            hit |= (d1 * d2 < 0) & (d3 * d4 < 0)
        crossing[ci[hit]] = True
    boundary = vert_in | crossing

    corners_x = np.concatenate([west, east, east, west])
    corners_y = np.concatenate([south, south, north, north])
    inside = points_in_ring(corners_x, corners_y, ring).reshape(4, m)
    n_in = inside.sum(axis=0)

    out = np.full(m, PARTIAL, dtype=np.int8)
    out[(~boundary) & (n_in == 4)] = FULL
    out[(~boundary) & (n_in == 0)] = OUTSIDE
    return out


def compact_cover(ring, min_res: int = 5, max_res: int = 9,
                  max_cells: int = 4096) -> list[tuple[int, bool]]:
    """Compact quadkey cover of a closed lon/lat ring.

    Returns [(cell_id, is_full)] — FULL cells may sit at any res in
    [min_res, max_res]; PARTIAL leaves are at max_res. Guaranteed
    superset of the polygon (property-tested).
    """
    ring = np.asarray(ring, dtype=np.float64)
    west, south, east, north = _ring_bbox(ring)
    seeds = set()
    for lat, lon in ((south, west), (south, east), (north, west), (north, east)):
        seeds.add(int(quadkey.cell_id(lat, lon, min_res)))
    # fill the seed rectangle at min_res
    r0, x0, y0 = quadkey.decode(int(quadkey.cell_id(south, west, min_res)))
    r1, x1, y1 = quadkey.decode(int(quadkey.cell_id(north, east, min_res)))
    for yy in range(int(y0), int(y1) + 1):
        for xx in range(int(x0), int(x1) + 1):
            seeds.add((min_res << 54) + (yy << 27) + xx)

    out: list[tuple[int, bool]] = []
    frontier = np.array(sorted(seeds), dtype=np.int64)
    while len(frontier):
        kinds = classify_cells(frontier, ring)
        if len(out) + len(frontier) > max_cells:
            # degrade gracefully: emit the remaining frontier as partial
            out.extend((int(c), False) for c in frontier[kinds != OUTSIDE])
            break
        res = (frontier >> quadkey._RES_SHIFT).astype(np.int64)
        for c in frontier[kinds == FULL]:
            out.append((int(c), True))
        at_leaf = (kinds == PARTIAL) & (res >= max_res)
        for c in frontier[at_leaf]:
            out.append((int(c), False))
        to_refine = frontier[(kinds == PARTIAL) & (res < max_res)]
        next_frontier: list[int] = []
        for cell in to_refine:
            next_frontier.extend(quadkey.children(int(cell)))
        frontier = np.array(sorted(next_frontier), dtype=np.int64)
    return out


def cover_cells_at_res(ring, res: int, max_cells: int = 4096) -> list[int]:
    """Flat (non-compact) cover: all res-`res` cells touching the ring."""
    return sorted(
        {int(c) if full else int(c)
         for c, full in compact_cover(ring, min_res=res, max_res=res, max_cells=max_cells)}
    )
