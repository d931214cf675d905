"""True S2 compact polygon covers (north star: polygons tiled "into H3
(res 5-9) and S2 cells via a compact-cover algorithm").

Quadtree descent from the 6 face cells: children partition their parent
EXACTLY (unlike H3's overhanging aperture-7), so membership semantics
are pure id-range containment — a point is covered iff its leaf id
falls inside some cover cell's [range_min, range_max]. Vertex-in-cell
tests are exact integer range checks on the ring's precomputed leaf
ids; corner/edge tests run on the lon/lat corner quad with a small
dilation absorbing the chord-vs-geodesic curvature of cell edges.

Batching architecture (round 4, mirroring ops/h3tiles): the descent
runs over GROUPS of rings — cells carry an `owner` ring index and every
level's decode/corner/classify/children kernel executes once for the
whole group. Per-(cell, segment) work is restricted to the cell's own
ring by CSR expansion over the group's concatenated edges
(index.pip.RingSet); the exact vertex-in-range test uses each ring's
own sorted leaf ids. Pole-holding cells (corner block still spanning
>180 deg of longitude after coherent unwrap) classify by their own
ring's latitude band — |lat| over an S2 cell is extremized at a
uv-corner, so corner latitudes bound the cell's reach exactly.

`s2_polygon_tiles` fans the cover over the features DataFrame in one
narrow Arrow map (mega-polygons split into bounded cell rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..index import s2
from ..index.pip import RingSet, points_in_ring

OUTSIDE, PARTIAL, FULL = 0, 1, 2
# straight lon/lat chords understate the geodesic cell edges; 5% corner
# dilation keeps FULL/OUTSIDE verdicts conservative at level >= 3
_CURVATURE_DILATION = 0.05

# chunk the cell axis of the pair-expansion kernel to bound memory
_CLASSIFY_CHUNK = 65536

# rings per kernel group — same cache-vs-amortization tradeoff as the
# H3 cover (see ops/h3tiles._RING_GROUP)
_RING_GROUP = 8


class _S2RingBatch:
    """Per-group geometry: CSR ring edges + segment bboxes (RingSet
    layout), per-ring bbox/center-lon, and each ring's sorted level-30
    leaf ids for the exact vertex-in-range test."""

    def __init__(self, rings: list):
        self.rings = rings
        self.rs = RingSet({i: r for i, r in enumerate(rings)})
        rs = self.rs
        self.sxmin = np.minimum(rs.x1, rs.x2)
        self.sxmax = np.maximum(rs.x1, rs.x2)
        self.symin = np.minimum(rs.y1, rs.y2)
        self.symax = np.maximum(rs.y1, rs.y2)
        self.bbox = np.stack([
            np.array([r[:, 0].min() for r in rings]),
            np.array([r[:, 1].min() for r in rings]),
            np.array([r[:, 0].max() for r in rings]),
            np.array([r[:, 1].max() for r in rings]),
        ], axis=1)
        self.cx = (self.bbox[:, 0] + self.bbox[:, 2]) / 2.0
        # unsigned leaf ids: range containment must compare in unsigned
        # id space (faces 4-5 set the sign bit of the int64 form)
        self.leaf_sorted = [
            np.sort(np.asarray(
                s2.cell_id(r[:, 1], r[:, 0], s2.MAX_LEVEL),
                dtype=np.int64).astype(np.uint64))
            for r in rings]


def _classify_level_multi(cells: np.ndarray, owner: np.ndarray, level: int,
                          rb: _S2RingBatch) -> np.ndarray:
    """Vectorized FULL/PARTIAL/OUTSIDE verdicts for one level's frontier
    (`cells` uint64, all at `level`), each against its own ring."""
    n = len(cells)
    verdict = np.zeros(n, dtype=np.int8)
    if n == 0:
        return verdict
    rs = rb.rs
    # exact vertex-in-cell: any own-ring leaf id inside the cell's range
    lo, hi = s2.range_min_max_arrays(cells)
    vertex_in = np.zeros(n, dtype=bool)
    for r_idx in np.unique(owner):
        m = owner == r_idx
        ls = rb.leaf_sorted[r_idx]
        pos = np.searchsorted(ls, lo[m], side="left")
        pos_c = np.minimum(pos, len(ls) - 1)
        vertex_in[m] = (ls[pos_c] <= hi[m]) & (pos < len(ls))

    corners = s2.cells_corners_latlon(cells, level)          # (n, 4, 2)
    # lon-coherent corner block (corners wrap independently out of
    # atan2), then shift the block toward the own ring
    corners = corners.copy()
    corners[:, :, 0] += 360.0 * np.round(
        (corners[:, 0, 0][:, None] - corners[:, :, 0]) / 360.0)
    corners[:, :, 0] += 360.0 * np.round(
        (rb.cx[owner] - corners[:, :, 0].mean(axis=1))[:, None] / 360.0)

    span = corners[:, :, 0].max(axis=1) - corners[:, :, 0].min(axis=1)
    pole = span > 180.0
    if bool(pole.any()):
        # a pole-holding cell clipped by a ring EDGE can have no ring
        # vertex inside it; bound by the own ring's latitude band
        # (corner |lat| is the exact extremum over the cell)
        north = corners[:, :, 1].mean(axis=1) > 0.0
        reach = np.where(
            north, rb.bbox[owner, 3] >= corners[:, :, 1].min(axis=1),
            rb.bbox[owner, 1] <= corners[:, :, 1].max(axis=1))
        verdict[pole] = np.where(vertex_in[pole] | reach[pole],
                                 PARTIAL, OUTSIDE)

    idx = np.nonzero(~pole)[0]
    if len(idx) == 0:
        return verdict
    b = corners[idx]
    c = b.mean(axis=1, keepdims=True)
    b = c + (b - c) * (1.0 + _CURVATURE_DILATION)
    # cheap bbox rejection vs own ring bbox (vertex-holding cells can
    # never be OUTSIDE)
    bb = rb.bbox[owner[idx]]
    out_bbox = ((b[:, :, 0].max(axis=1) < bb[:, 0])
                | (b[:, :, 0].min(axis=1) > bb[:, 2])
                | (b[:, :, 1].max(axis=1) < bb[:, 1])
                | (b[:, :, 1].min(axis=1) > bb[:, 3]))
    alive = ~(out_bbox & ~vertex_in[idx])
    sel = idx[alive]
    if len(sel) == 0:
        return verdict
    ball = b[alive]

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    for s0 in range(0, len(sel), _CLASSIFY_CHUNK):
        sl = slice(s0, min(s0 + _CLASSIFY_CHUNK, len(sel)))
        hb = ball[sl]
        m = len(hb)
        o = owner[sel[sl]]
        hx1, hy1 = hb[:, :, 0], hb[:, :, 1]
        hx2 = np.roll(hx1, -1, axis=1)
        hy2 = np.roll(hy1, -1, axis=1)
        cxmin, cxmax = hx1.min(axis=1), hx1.max(axis=1)
        cymin, cymax = hy1.min(axis=1), hy1.max(axis=1)
        # CSR expansion to (cell, own-ring segment) pairs, bbox-pruned
        lens = rs.lens[o]
        crow = np.repeat(np.arange(m), lens)
        cum = np.cumsum(lens)
        within = np.arange(int(cum[-1])) - np.repeat(cum - lens, lens)
        seg = np.repeat(rs.starts[o], lens) + within
        keep = ((cxmin[crow] <= rb.sxmax[seg]) & (cxmax[crow] >= rb.sxmin[seg])
                & (cymin[crow] <= rb.symax[seg]) & (cymax[crow] >= rb.symin[seg]))
        pc, ps = crow[keep], seg[keep]
        crossing = np.zeros(m, dtype=bool)
        if len(pc):
            ax1, ay1 = hx1[pc], hy1[pc]                  # (P, 4)
            ax2, ay2 = hx2[pc], hy2[pc]
            bx1, by1 = rs.x1[ps][:, None], rs.y1[ps][:, None]
            bx2, by2 = rs.x2[ps][:, None], rs.y2[ps][:, None]
            d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
            d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
            hit = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=1)
            crossing[pc[hit]] = True
        partial = crossing | vertex_in[sel[sl]]
        # corner-in-ring only for cells not already PARTIAL; one corner
        # decides OUTSIDE (no crossing + no vertex inside => all corners
        # on one side), the rest verify FULL (conservative side)
        rows = np.nonzero(~partial)[0]
        all_in = np.zeros(m, dtype=bool)
        any_in = np.zeros(m, dtype=bool)
        if len(rows):
            # grouped per-owner 2D ray cast — ~2x the CSR RingSet path
            # at cover batch sizes (no expansion-index build)
            c0 = np.zeros(len(rows), dtype=bool)
            orow = o[rows]
            for ov in np.unique(orow):
                mg = orow == ov
                c0[mg] = points_in_ring(hx1[rows[mg], 0], hy1[rows[mg], 0],
                                        rb.rings[ov])
            in_rows = rows[c0]
            if len(in_rows):
                oin = o[in_rows]
                rest = np.zeros((len(in_rows), 3), dtype=bool)
                for ov in np.unique(oin):
                    mg = oin == ov
                    rest[mg] = points_in_ring(
                        hx1[in_rows[mg], 1:].ravel(),
                        hy1[in_rows[mg], 1:].ravel(),
                        rb.rings[ov]).reshape(-1, 3)
                all_in[in_rows] = rest.all(axis=1)
                any_in[in_rows] = True
        verdict[sel[sl]] = np.where(
            partial, PARTIAL,
            np.where(all_in, FULL, np.where(any_in, PARTIAL, OUTSIDE))
        ).astype(np.int8)
    return verdict


def s2_cover_batch(rings: list, max_level: int = 10,
                   max_cells: int = 16384) -> list:
    """Compact S2 covers of many closed lon/lat rings; returns one
    (n_i, 3) array-backed list [(cell_id, level, is_full)] per ring
    (same cells as covering each ring alone). FULL cells stay at the
    coarsest level the curvature-safe test allows (>= 3, the compact
    form); PARTIAL cells refine to max_level. Membership: a point is
    covered iff its level-30 leaf id lies in some cover cell's id range.
    `max_cells` bounds each ring independently (its remaining frontier
    is emitted as partial leaves)."""
    out_all: list = []
    for s in range(0, len(rings), _RING_GROUP):
        out_all.extend(_cover_group(rings[s:s + _RING_GROUP],
                                    max_level, max_cells))
    return out_all


def _cover_group(rings: list, max_level: int, max_cells: int) -> list:
    nr = len(rings)
    if nr == 0:
        return []
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    rb = _S2RingBatch(rings)

    outs: list = [[] for _ in range(nr)]
    n_out = np.zeros(nr, dtype=np.int64)

    faces = np.array([(f << 61) | (1 << 60) for f in range(6)],
                     dtype=np.uint64)
    frontier = np.tile(faces, nr)
    fowner = np.repeat(np.arange(nr, dtype=np.int64), 6)
    for level in range(0, max_level + 1):
        if len(frontier) == 0:
            break
        v = _classify_level_multi(frontier, fowner, level, rb)
        full_ok = (v == FULL) & (level >= 3)
        for c, o in zip(frontier[full_ok], fowner[full_ok]):
            outs[o].append((int(c), level, True))
        n_out += np.bincount(fowner[full_ok], minlength=nr)
        desc = (v == PARTIAL) | ((v == FULL) & (level < 3))
        descend, downer = frontier[desc], fowner[desc]
        if level == max_level:
            for c, o in zip(descend, downer):
                outs[o].append((int(c), level, False))
            break
        kids = s2.children_arrays(descend)
        kowner = np.repeat(downer, 4)
        # per-ring cap: rings whose cover would overflow emit their
        # children as partial leaves and stop descending
        add = np.bincount(kowner, minlength=nr)
        over = (n_out + add) > max_cells
        if bool(over.any()):
            capped = over[kowner]
            for c, o in zip(kids[capped], kowner[capped]):
                outs[o].append((int(c), level + 1, False))
            n_out += np.bincount(kowner[capped], minlength=nr)
            kids, kowner = kids[~capped], kowner[~capped]
        frontier, fowner = kids, kowner
    return outs


def s2_cover(ring, max_level: int = 10, max_cells: int = 16384) -> list:
    """[(cell_id, level, is_full)] compact S2 cover of ONE closed
    lon/lat ring (see s2_cover_batch for semantics)."""
    return s2_cover_batch([ring], max_level, max_cells)[0]


S2_TILES_SCHEMA = ("url string, airspace_idx int, s2_cell long, s2_level int, "
                   "is_full boolean")


def s2_polygon_tiles(features: DataFrame,
                     max_level: int = 10, max_cells: int = 16384) -> DataFrame:
    """features(url, airspace_idx, ring, ...) -> one row per S2 cover
    cell. Narrow Arrow map, no shuffle; each Arrow batch covers in
    grouped s2_cover_batch calls."""
    from pyspark.sql import functions as F

    src = (
        features.where(F.col("success") & (F.col("geometry_type") == "Polygon"))
        .select("url", "airspace_idx", "ring")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in S2_TILES_SCHEMA.split(", ")]
        for pdf in batches:
            urls: list = []
            idxs: list = []
            rings: list = []
            for url, idx, ring in zip(pdf["url"], pdf["airspace_idx"], pdf["ring"]):
                if ring is None or len(ring) < 4:
                    continue
                urls.append(url)
                idxs.append(int(idx))
                rings.append(np.asarray([list(p) for p in ring],
                                        dtype=np.float64))
            if not rings:
                yield pd.DataFrame(columns=cols)
                continue
            covers = s2_cover_batch(rings, max_level, max_cells)
            keep = [i for i, cov in enumerate(covers) if cov]
            if not keep:
                yield pd.DataFrame(columns=cols)
                continue
            counts = [len(covers[i]) for i in keep]
            # unsigned ids -> two's-complement int64 (Spark LongType)
            chunks = []
            for i in keep:
                a = np.asarray([c for c, _, _ in covers[i]], dtype=np.uint64)
                chunks.append(np.stack([
                    a.astype(np.int64),
                    np.asarray([lv for _, lv, _ in covers[i]], dtype=np.int64),
                    np.asarray([fl for _, _, fl in covers[i]], dtype=np.int64),
                ], axis=1))
            flat = np.concatenate(chunks)
            yield pd.DataFrame({
                "url": np.repeat(
                    np.asarray([urls[i] for i in keep], dtype=object), counts),
                "airspace_idx": np.repeat(
                    np.asarray([idxs[i] for i in keep], dtype=np.int32), counts),
                "s2_cell": flat[:, 0],
                "s2_level": flat[:, 1].astype(np.int32),
                "is_full": flat[:, 2].astype(bool),
            })[cols]

    return src.mapInPandas(kernel, S2_TILES_SCHEMA)
