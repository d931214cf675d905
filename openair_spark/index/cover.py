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


def _ring_touches_bbox(ring: np.ndarray, west, south, east, north) -> bool:
    """Any ring vertex inside the bbox, or any ring edge crossing a bbox
    edge (the 'boundary passes through the cell' test)."""
    x, y = ring[:, 0], ring[:, 1]
    if bool(np.any((x >= west) & (x <= east) & (y >= south) & (y <= north))):
        return True
    x1, y1 = x[:-1], y[:-1]
    x2, y2 = x[1:], y[1:]
    for (ax, ay, bx, by) in (
        (west, south, east, south), (east, south, east, north),
        (east, north, west, north), (west, north, west, south),
    ):
        d1 = (bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax)
        d2 = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
        d3 = (x2 - x1) * (ay - y1) - (y2 - y1) * (ax - x1)
        d4 = (x2 - x1) * (by - y1) - (y2 - y1) * (bx - x1)
        if bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0))):
            return True
    return False


def _classify_cell(cell: int, ring: np.ndarray) -> str:
    west, south, east, north = quadkey.cell_bounds(cell)
    boundary_in_cell = _ring_touches_bbox(ring, west, south, east, north)
    corners_x = np.array([west, east, east, west])
    corners_y = np.array([south, south, north, north])
    inside = points_in_ring(corners_x, corners_y, ring)
    if not boundary_in_cell:
        if bool(inside.all()):
            return "FULL"
        if bool(inside.any()):
            # Mixed corner verdicts with no detected boundary can only
            # happen when the ring grazes the cell edge exactly (the
            # crossing test is strict and the corner PIP is half-open):
            # treat as PARTIAL so the cover stays a superset.
            return "PARTIAL"
        return "OUTSIDE"
    return "PARTIAL"


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
    frontier = sorted(seeds)
    while frontier:
        if len(out) + len(frontier) > max_cells:
            # degrade gracefully: emit the remaining frontier as partial
            out.extend((c, False) for c in frontier
                       if _classify_cell(c, ring) != "OUTSIDE")
            break
        next_frontier: list[int] = []
        for cell in frontier:
            kind = _classify_cell(cell, ring)
            if kind == "OUTSIDE":
                continue
            res = int(quadkey.decode(cell)[0])
            if kind == "FULL":
                out.append((cell, True))
            elif res >= max_res:
                out.append((cell, False))
            else:
                next_frontier.extend(quadkey.children(cell))
        frontier = sorted(next_frontier)
    return out


def cover_cells_at_res(ring, res: int, max_cells: int = 4096) -> list[int]:
    """Flat (non-compact) cover: all res-`res` cells touching the ring."""
    return sorted(
        {int(c) if full else int(c)
         for c, full in compact_cover(ring, min_res=res, max_res=res, max_cells=max_cells)}
    )
