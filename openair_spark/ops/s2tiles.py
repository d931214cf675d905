"""True S2 compact polygon covers (north star: polygons tiled "into H3
(res 5-9) and S2 cells via a compact-cover algorithm").

Quadtree descent from the 6 face cells: children partition their parent
EXACTLY (unlike H3's overhanging aperture-7), so membership semantics
are pure id-range containment — a point is covered iff its leaf id
falls inside some cover cell's [range_min, range_max]. Vertex-in-cell
tests are exact integer range checks on the ring's precomputed leaf
ids; corner/edge tests run on the lon/lat corner quad with a small
dilation absorbing the chord-vs-geodesic curvature of cell edges.

`s2_polygon_tiles` fans the cover over the features DataFrame in one
narrow Arrow map (mega-polygons split into bounded cell rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..index import s2
from ..index.pip import points_in_ring

OUTSIDE, PARTIAL, FULL = 0, 1, 2
# straight lon/lat chords understate the geodesic cell edges; 5% corner
# dilation keeps FULL/OUTSIDE verdicts conservative at level >= 3
_CURVATURE_DILATION = 0.05


def _segments_cross(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    ax1, ay1, ax2, ay2 = (v[:, None] for v in (ax1, ay1, ax2, ay2))
    bx1, by1, bx2, by2 = (v[None, :] for v in (bx1, by1, bx2, by2))
    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def _classify(cell: int, ring: np.ndarray, leaf_ids: np.ndarray,
              ring_bbox: tuple) -> int:
    lo, hi = s2.range_min_max(cell)
    vertex_in = bool(((leaf_ids >= np.uint64(lo))
                      & (leaf_ids <= np.uint64(hi))).any())
    corners = np.asarray(s2.cell_corners_latlon(cell), dtype=np.float64)
    w, s_, e, n = ring_bbox
    ring_cx = (w + e) / 2.0
    # make the corner block lon-COHERENT first (corners of a cell
    # straddling any meridian wrap independently out of atan2 — unwrap
    # each toward corner 0), THEN shift the whole block toward the ring.
    # Per-corner unwrap toward the ring center split cells sitting near
    # ring_cx +- 180 into a fake >180-deg span, which the pole branch
    # then descended to max_level (a stray antipodal cell strip).
    corners[:, 0] += 360.0 * np.round((corners[0, 0] - corners[:, 0]) / 360.0)
    corners[:, 0] += 360.0 * np.round((ring_cx - corners[:, 0].mean()) / 360.0)
    if corners[:, 0].max() - corners[:, 0].min() > 180.0:
        # still spanning >180 deg after unwrap: the cell holds (or hugs)
        # a pole. Rings are lon/lat-local (engine-wide: no pole
        # crossing), but a ring EDGE can clip such a cell with no ring
        # vertex inside it (face boundaries are curved in lon/lat — e.g.
        # a mid-latitude ring near a face corner at lat ~35, lon 45).
        # |lat| over an S2 cell is extremized at a uv-corner (|lat| =
        # atan(1/hypot(u', v')) and hypot is convex), so the corner
        # latitudes bound the cell's reach exactly: OUTSIDE only when
        # the ring's latitude band provably cannot reach the cell;
        # otherwise descend (children leave the pole branch quickly).
        if vertex_in:
            return PARTIAL
        if corners[:, 1].mean() > 0.0:  # north-side cell
            return PARTIAL if n >= corners[:, 1].min() else OUTSIDE
        return PARTIAL if s_ <= corners[:, 1].max() else OUTSIDE
    c = corners.mean(axis=0)
    b = c + (corners - c) * (1.0 + _CURVATURE_DILATION)
    if not vertex_in:
        # cheap bbox rejection before the segment/PIP matrices
        w, s_, e, n = ring_bbox
        if (b[:, 0].max() < w or b[:, 0].min() > e
                or b[:, 1].max() < s_ or b[:, 1].min() > n):
            return OUTSIDE
    qx1, qy1 = b[:, 0], b[:, 1]
    qx2, qy2 = np.roll(b[:, 0], -1), np.roll(b[:, 1], -1)
    crossing = bool(_segments_cross(
        qx1, qy1, qx2, qy2,
        ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1]).any())
    if vertex_in or crossing:
        return PARTIAL
    corners_in = points_in_ring(b[:, 0], b[:, 1], ring)
    if corners_in.all():
        return FULL
    if corners_in.any():
        return PARTIAL
    return OUTSIDE


def s2_cover(ring, max_level: int = 10, max_cells: int = 16384) -> list:
    """[(cell_id, level, is_full)] compact S2 cover of a closed lon/lat
    ring. FULL cells stay at the coarsest level the curvature-safe test
    allows (>= 3, the compact form); PARTIAL cells refine to max_level.
    Membership: a point is covered iff its level-30 leaf id lies in
    some cover cell's id range."""
    ring = np.asarray(ring, dtype=np.float64)
    # unsigned leaf ids: range containment must compare in unsigned id
    # space (faces 4-5 set the sign bit of the int64 representation)
    leaf_ids = np.asarray(
        s2.cell_id(ring[:, 1], ring[:, 0], s2.MAX_LEVEL),
        dtype=np.int64).astype(np.uint64)
    ring_bbox = (float(ring[:, 0].min()), float(ring[:, 1].min()),
                 float(ring[:, 0].max()), float(ring[:, 1].max()))
    frontier = [(f << 61) | (1 << 60) for f in range(6)]
    out: list = []
    level = 0
    while frontier and level <= max_level:
        nxt: list = []
        for cell in frontier:
            verdict = _classify(int(cell), ring, leaf_ids, ring_bbox)
            if verdict == OUTSIDE:
                continue
            if verdict == FULL and level >= 3:
                out.append((int(cell), level, True))
            elif level == max_level:
                out.append((int(cell), level, False))
            else:
                nxt.extend(int(k) for k in s2.children(cell))
        if len(out) + len(nxt) > max_cells:
            # cap: emit the remaining frontier as partial leaves
            out.extend((int(c), level + 1, False) for c in nxt)
            return out
        frontier = nxt
        level += 1
    return out


S2_TILES_SCHEMA = ("url string, airspace_idx int, s2_cell long, s2_level int, "
                   "is_full boolean")


def s2_polygon_tiles(features: DataFrame,
                     max_level: int = 10, max_cells: int = 16384) -> DataFrame:
    """features(url, airspace_idx, ring, ...) -> one row per S2 cover
    cell. Narrow Arrow map, no shuffle."""
    from pyspark.sql import functions as F

    src = (
        features.where(F.col("success") & (F.col("geometry_type") == "Polygon"))
        .select("url", "airspace_idx", "ring")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in S2_TILES_SCHEMA.split(", ")]
        for pdf in batches:
            out: list[dict] = []
            for url, idx, ring in zip(pdf["url"], pdf["airspace_idx"], pdf["ring"]):
                if ring is None or len(ring) < 4:
                    continue
                arr = np.asarray([list(p) for p in ring], dtype=np.float64)
                for cell, level, is_full in s2_cover(arr, max_level, max_cells):
                    out.append({"url": url, "airspace_idx": int(idx),
                                "s2_cell": s2.to_signed(int(cell)),
                                "s2_level": int(level),
                                "is_full": bool(is_full)})
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(kernel, S2_TILES_SCHEMA)
