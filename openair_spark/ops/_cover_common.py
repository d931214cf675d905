"""Shared machinery of the batched polygon-cover classifiers
(ops/h3tiles + ops/s2tiles): per-group ring geometry, the CSR
(cell, own-ring segment) pair expansion with proper-crossing tests, and
the grouped corner-in-ring split. One implementation so a fix to the
crossing/corner logic cannot silently diverge between the two covers.
"""

from __future__ import annotations

import numpy as np

from ..index.pip import RingSet, points_in_ring

# pair-expansion budget: the CSR expansion materializes
# (chunk_cells x own-ring-segments) index/coordinate temporaries BEFORE
# bbox pruning; chunking by a pair budget (instead of a fixed cell
# count) keeps peak temp memory bounded for arc-heavy rings with
# thousands of segments
_PAIR_BUDGET = 4_000_000
_MIN_CHUNK = 1024
_MAX_CHUNK = 65536


class RingBatch:
    """CSR geometry of a batch of closed rings: concatenated edges
    (RingSet layout), per-segment bboxes, per-ring bbox and center
    longitude."""

    def __init__(self, rings: list):
        self.rings = rings
        self.rs = RingSet({i: r for i, r in enumerate(rings)})
        rs = self.rs
        self.sxmin = np.minimum(rs.x1, rs.x2)
        self.sxmax = np.maximum(rs.x1, rs.x2)
        self.symin = np.minimum(rs.y1, rs.y2)
        self.symax = np.maximum(rs.y1, rs.y2)
        self.bbox = np.stack([  # (R, 4): w, s, e, n
            np.array([r[:, 0].min() for r in rings]),
            np.array([r[:, 1].min() for r in rings]),
            np.array([r[:, 0].max() for r in rings]),
            np.array([r[:, 1].max() for r in rings]),
        ], axis=1) if rings else np.empty((0, 4))
        self.cx = (self.bbox[:, 0] + self.bbox[:, 2]) / 2.0

    def chunk_size(self) -> int:
        """Cell-axis chunk honoring the pair budget for this batch's
        longest ring."""
        max_len = int(self.rs.lens.max()) if len(self.rs.lens) else 1
        return int(np.clip(_PAIR_BUDGET // max(1, max_len),
                           _MIN_CHUNK, _MAX_CHUNK))


def expand_pairs(owner_chunk: np.ndarray, rs: RingSet):
    """(crow, seg): CSR expansion of every (cell, own-ring segment)
    pair for one chunk of cells (crow indexes the chunk)."""
    lens = rs.lens[owner_chunk]
    crow = np.repeat(np.arange(len(owner_chunk)), lens)
    cum = np.cumsum(lens)
    within = (np.arange(int(cum[-1]) if len(owner_chunk) else 0)
              - np.repeat(cum - lens, lens))
    seg = np.repeat(rs.starts[owner_chunk], lens) + within
    return crow, seg


def _orient(px, py, qx, qy, rx, ry):
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def proper_crossings(hx1, hy1, hx2, hy2, crow, seg, rs: RingSet,
                     n_cells: int) -> np.ndarray:
    """(n_cells,) bool: does any of the cell's edges PROPERLY cross any
    of the gathered (crow, seg) ring segments (d1*d2 < 0 strictly —
    touching/collinear contact is intentionally not a crossing; the
    callers' corner logic documents that tradeoff)."""
    crossing = np.zeros(n_cells, dtype=bool)
    if len(crow) == 0:
        return crossing
    ax1, ay1 = hx1[crow], hy1[crow]                 # (P, V)
    ax2, ay2 = hx2[crow], hy2[crow]
    bx1, by1 = rs.x1[seg][:, None], rs.y1[seg][:, None]
    bx2, by2 = rs.x2[seg][:, None], rs.y2[seg][:, None]
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    hit = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=1)
    crossing[crow[hit]] = True
    return crossing


def corner_split(hx1, hy1, partial: np.ndarray, owner: np.ndarray,
                 rings: list, nv: int):
    """(all_in, any_in) for cells not already PARTIAL, from ALL nv
    corners (any_in => PARTIAL unless all_in => FULL). Testing every
    corner keeps the cover's conservative direction: a mixed-corner
    cell with no detected proper crossing (possible only when a ring
    vertex sits exactly on a cell edge — measure zero for float data,
    but ADVICE r4 asked for the safe side) classifies PARTIAL rather
    than OUTSIDE. Cost parity with the old corner-0-then-rest scheme:
    one grouped per-owner ray cast over nv corners instead of two
    kernel rounds (the ~9 ms/call fixed numpy overhead dominates at
    cover batch sizes, so fewer calls ~ offsets the extra points)."""
    m = len(partial)
    rows = np.nonzero(~partial)[0]
    all_in = np.zeros(m, dtype=bool)
    any_in = np.zeros(m, dtype=bool)
    if len(rows):
        orow = owner[rows]
        corners = np.zeros((len(rows), nv), dtype=bool)
        for ov in np.unique(orow):
            mg = orow == ov
            corners[mg] = points_in_ring(
                hx1[rows[mg]].ravel(), hy1[rows[mg]].ravel(),
                rings[ov]).reshape(-1, nv)
        all_in[rows] = corners.all(axis=1)
        any_in[rows] = corners.any(axis=1)
    return all_in, any_in
