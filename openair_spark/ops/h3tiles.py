"""True H3 compact polygon covers (north star: "Every resulting polygon
is tiled into H3 (res 5-9) ... via a compact-cover algorithm").

`h3_cover` tiles one lon/lat ring into bit-compatible H3 cells:
BFS flood from the ring's vertex/centroid cells at `min_res`, classify
each hexagon FULL / PARTIAL / OUTSIDE against the ring, keep FULL cells
at their (coarsest) resolution — that IS the compact form — and refine
PARTIAL cells through the children until `max_res`.

`h3_polygon_tiles` runs the cover inside an Arrow-batched mapInPandas
over the features DataFrame — narrow map, no shuffle; a mega-polygon
becomes many bounded (h3_cell, res) rows (skew splitting), with a
`max_cells` guard for hostile rings.

Classification is LEVEL-BATCHED: one vectorized
`index.h3.cells_to_boundaries` call per refinement level produces every
candidate's substrate-exact corners (exact across icosahedron edges and
exact pentagons incl. class III distortion vertices — see index/h3.py),
and the vertex-in-hex / corner-in-ring / segment-crossing tests run on
stacked arrays. Round 2 classified each cell from a Python loop, which
made the mandate depth (res 9) unaffordable; the batched kernel runs
the full res 5-9 sweep.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..index import h3
from ..index.pip import points_in_ring

OUTSIDE, PARTIAL, FULL = 0, 1, 2

# Aperture-7 children overhang their parent hexagon (the H3 hierarchy is
# an index relation, not territory containment): per level the overhang
# is a few percent of the circumradius, ~5% cumulative over all deeper
# levels; 15% also absorbs gnomonic corner distortion. Classifying a
# coarse cell against its dilated boundary makes FULL mean "every
# descendant's territory is inside" and OUTSIDE mean "no descendant's
# territory touches" — which is what the compact-set semantics
# (cover membership = ancestor of the point's max_res cell) require.
_CHILD_OVERHANG_DILATION = 0.15

# classification works on stacked (m, 6, R) orientation matrices; chunk
# the cell axis to bound worker memory on long rings
_CLASSIFY_CHUNK = 4096


def _classify_batch(bnds: np.ndarray, ring: np.ndarray,
                    dilate=0.0) -> np.ndarray:
    """FULL / PARTIAL / OUTSIDE verdicts of many H3 cells vs one closed
    ring. `bnds` is (n, V, 2) [lon, lat]; `dilate` is a scalar or a
    per-cell (n,) array; returns (n,) int8."""
    n = len(bnds)
    verdict = np.zeros(n, dtype=np.int8)
    if n == 0:
        return verdict
    b = bnds
    # antimeridian safety, mirroring the S2 cover: first make each
    # boundary internally lon-coherent (unwrap every vertex toward the
    # cell's vertex 0 — cells straddling ±180 otherwise classify against
    # a self-inconsistent polygon), then shift whole cells toward the
    # ring using the coherent mean longitude
    ring_cx = (float(ring[:, 0].min()) + float(ring[:, 0].max())) / 2.0
    lon = b[:, :, 0]
    unwrap = 360.0 * np.round((lon[:, :1] - lon) / 360.0)
    shift = 360.0 * np.round((ring_cx - (lon + unwrap).mean(axis=1)) / 360.0)
    if np.any(unwrap) or np.any(shift):
        b = b.copy()
        b[:, :, 0] += unwrap + shift[:, None]
    if np.any(dilate):
        d = (np.asarray(dilate, dtype=np.float64).reshape(-1, 1, 1)
             if np.ndim(dilate) else dilate)
        c = b.mean(axis=1, keepdims=True)
        b = c + (b - c) * (1.0 + d)
    # cheap bbox rejection before the pair matrices
    rw, re_ = float(ring[:, 0].min()), float(ring[:, 0].max())
    rs, rn = float(ring[:, 1].min()), float(ring[:, 1].max())
    near = ~((b[:, :, 0].max(axis=1) < rw) | (b[:, :, 0].min(axis=1) > re_)
             | (b[:, :, 1].max(axis=1) < rs) | (b[:, :, 1].min(axis=1) > rn))
    idx = np.nonzero(near)[0]
    rx1, ry1 = ring[:-1, 0], ring[:-1, 1]
    rx2, ry2 = ring[1:, 0], ring[1:, 1]
    nv = b.shape[1]
    sxmin, sxmax = np.minimum(rx1, rx2), np.maximum(rx1, rx2)
    symin, symax = np.minimum(ry1, ry2), np.maximum(ry1, ry2)

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    for s in range(0, len(idx), _CLASSIFY_CHUNK):
        sel = idx[s:s + _CLASSIFY_CHUNK]
        hb = b[sel]                                   # (m, V, 2)
        m = len(hb)
        hx1, hy1 = hb[:, :, 0], hb[:, :, 1]           # (m, V)
        hx2 = np.roll(hx1, -1, axis=1)
        hy2 = np.roll(hy1, -1, axis=1)
        cxmin, cxmax = hx1.min(axis=1), hx1.max(axis=1)
        cymin, cymax = hy1.min(axis=1), hy1.max(axis=1)
        # proper edge crossings — only (cell, ring segment) pairs whose
        # bboxes overlap can cross; gather those pairs (typically a few
        # per cell, vs the full m x R grid)
        pair = ((cxmin[:, None] <= sxmax[None, :])
                & (cxmax[:, None] >= sxmin[None, :])
                & (cymin[:, None] <= symax[None, :])
                & (cymax[:, None] >= symin[None, :]))
        pc, ps = np.nonzero(pair)
        crossing = np.zeros(m, dtype=bool)
        if len(pc):
            ax1, ay1 = hx1[pc], hy1[pc]               # (P, V)
            ax2, ay2 = hx2[pc], hy2[pc]
            bx1, by1 = rx1[ps][:, None], ry1[ps][:, None]
            bx2, by2 = rx2[ps][:, None], ry2[ps][:, None]
            d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
            d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
            hit = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=1)
            crossing[pc[hit]] = True
        # ring vertices inside the cell polygon? Even-odd crossing
        # number (the distorted boundary is not strictly convex), only
        # for (cell, ring vertex) pairs with the vertex in the cell bbox
        vpair = ((cxmin[:, None] <= rx1[None, :])
                 & (cxmax[:, None] >= rx1[None, :])
                 & (cymin[:, None] <= ry1[None, :])
                 & (cymax[:, None] >= ry1[None, :]))
        vc, vv = np.nonzero(vpair)
        vert_in = np.zeros(m, dtype=bool)
        if len(vc):
            py_ = ry1[vv][:, None]
            y_span = (hy1[vc] > py_) != (hy2[vc] > py_)   # (P2, V)
            with np.errstate(divide="ignore", invalid="ignore"):
                x_at = hx1[vc] + ((py_ - hy1[vc])
                                  * (hx2 - hx1)[vc] / (hy2 - hy1)[vc])
            inside = (((y_span & (rx1[vv][:, None] < x_at)).sum(axis=1)
                       % 2) == 1)
            vert_in[vc[inside]] = True
        partial = crossing | vert_in
        # cell corners inside the ring? Only for cells not already
        # PARTIAL. A non-partial cell has no edge crossing and no ring
        # vertex inside, so its corners are all-in or all-out: ONE
        # corner decides OUTSIDE (a mixed-corner cell without a detected
        # crossing would need a ring vertex exactly on a cell edge —
        # measure zero for float data); corner-0-inside cells still
        # verify FULL against the remaining corners (conservative side).
        rows = np.nonzero(~partial)[0]
        all_in = np.zeros(m, dtype=bool)
        any_in = np.zeros(m, dtype=bool)
        if len(rows):
            c0 = points_in_ring(hx1[rows, 0], hy1[rows, 0], ring)
            in_rows = rows[c0]
            if len(in_rows):
                rest = points_in_ring(
                    hx1[in_rows, 1:].ravel(), hy1[in_rows, 1:].ravel(),
                    ring).reshape(-1, nv - 1)
                all_in[in_rows] = rest.all(axis=1)
                any_in[in_rows] = True
        v = np.where(partial, PARTIAL,
                     np.where(all_in, FULL,
                              np.where(any_in, PARTIAL, OUTSIDE)))
        verdict[sel] = v.astype(np.int8)
    return verdict


def h3_cover(ring, min_res: int = 5, max_res: int = 9,
             max_cells: int = 16384) -> np.ndarray:
    """(n, 3) int64 array [h3_cell, res, is_full(0/1)]: compact cover of
    a closed lon/lat ring. (Array-native output — a 100k-cell cover as a
    list of Python tuples was a measurable share of the kernel's cost.)

    Membership semantics are the H3 compact-set ones: a point p is
    covered iff some ancestor-or-self of latlng_to_cell(p, max_res) is
    in the cover. FULL cells stay at the coarsest resolution that fits
    (compact form) and guarantee every max_res descendant's territory is
    inside the ring (dilated classification absorbs child overhang);
    PARTIAL cells refine to children until max_res. `max_cells` bounds
    hostile rings: when hit — in the BFS or in refinement — remaining
    unclassified cells are emitted as PARTIAL leaves at their current
    resolution, so the cover stays a superset."""
    ring = np.asarray(ring, dtype=np.float64)
    t = h3._tables()
    # seed: cells of every ring vertex + centroid, plus BFS flood
    # (flood-fill needs a connected superset seed touching the polygon)
    seeds = set(int(c) for c in np.atleast_1d(
        h3.latlng_to_cell(ring[:, 1], ring[:, 0], min_res)))
    cx, cy = float(ring[:-1, 0].mean()), float(ring[:-1, 1].mean())
    seeds.add(int(h3.latlng_to_cell(cy, cx, min_res)))

    groups: list = []
    n_out = 0

    def emit(cells_arr, res_l: int, is_full: bool) -> None:
        nonlocal n_out
        if len(cells_arr) == 0:
            return
        g = np.empty((len(cells_arr), 3), dtype=np.int64)
        g[:, 0] = cells_arr
        g[:, 1] = res_l
        g[:, 2] = 1 if is_full else 0
        groups.append(g)
        n_out += len(g)

    def done() -> np.ndarray:
        return (np.concatenate(groups) if groups
                else np.empty((0, 3), dtype=np.int64))

    seen: set = set(seeds)
    frontier = np.fromiter(seeds, dtype=np.int64)
    partial = np.empty(0, dtype=np.int64)
    dil = _CHILD_OVERHANG_DILATION if min_res < max_res else 0.0
    angs = np.arange(6) * (np.pi / 3.0)
    cos_a, sin_a = np.cos(angs), np.sin(angs)
    # distortion vertices exist only at class III (odd) resolutions, and
    # only on cells crossing an icosahedron edge: classify everything on
    # the 6-vertex boundary and re-classify the (typically empty)
    # distortion subset on its exact 12-slot boundary
    def classify_level(cells_arr, res_l: int, dilate) -> np.ndarray:
        if res_l % 2 == 1:
            b6, didx, b12 = h3.cells_to_boundaries(cells_arr, t,
                                                   distortion="sparse")
            v = _classify_batch(b6, ring, dilate=dilate)
            if len(didx):
                v[didx] = _classify_batch(b12, ring, dilate=dilate)
            return v
        return _classify_batch(h3.cells_to_boundaries(cells_arr, t),
                               ring, dilate=dilate)

    while len(frontier):
        v = classify_level(frontier, min_res, dil)
        emit(frontier[v == FULL], min_res, True)
        partial = np.concatenate([partial, frontier[v == PARTIAL]])
        expand = frontier[v != OUTSIDE]
        if len(expand) == 0:
            break
        # neighbor probes: centers one lattice step away, all six
        # directions of the whole level in one vectorized pass
        f, i, j, k, res = h3.cells_to_face_ijk(expand, t)
        x, y = h3._ijk_to_hex2d(i, j, k)
        px = (x[:, None] + cos_a[None, :]).ravel()
        py = (y[:, None] + sin_a[None, :]).ravel()
        plat, plon = h3._hex2d_to_geo_arrays(
            px, py, np.repeat(f, 6), np.repeat(res, 6))
        nbs = h3.latlng_to_cell(np.degrees(plat), np.degrees(plon), min_res)
        fresh = [int(nb) for nb in np.unique(nbs) if int(nb) not in seen]
        seen.update(fresh)
        frontier = np.asarray(fresh, dtype=np.int64)
        if len(seen) > max_cells:
            # cap: the still-unclassified frontier becomes PARTIAL
            # leaves at min_res — the cover stays a superset
            partial = np.concatenate([partial, frontier])
            break

    # refinement of PARTIAL cells, one vectorized level at a time
    for res_l in range(min_res + 1, max_res + 1):
        if len(partial) == 0:
            break
        children = h3.cells_to_children_next(partial, t)
        if n_out + len(children) > max_cells:
            # cap: emit the parents as partial leaves at the previous res
            emit(partial, res_l - 1, False)
            return done()
        dil = _CHILD_OVERHANG_DILATION if res_l < max_res else 0.0
        v = classify_level(children, res_l, dil)
        emit(children[v == FULL], res_l, True)
        partial = children[v == PARTIAL]
    emit(partial, max_res, False)
    return done()


H3_TILES_SCHEMA = ("url string, airspace_idx int, h3_cell long, h3_res int, "
                   "is_full boolean")


def h3_polygon_tiles(features: DataFrame, min_res: int = 5, max_res: int = 9,
                     max_cells: int = 16384) -> DataFrame:
    """features(url, airspace_idx, ring, ...) -> one row per H3 cover
    cell. Narrow Arrow map (no shuffle); default res range 5-9 is the
    north-star mandate depth (affordable since the classification is
    level-batched)."""
    from pyspark.sql import functions as F

    src = (
        features.where(F.col("success") & (F.col("geometry_type") == "Polygon"))
        .select("url", "airspace_idx", "ring")
    )
    h3_tables = h3._tables()  # once on the driver; seeded into workers

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h3.seed_tables(h3_tables)
        cols = [c.split()[0] for c in H3_TILES_SCHEMA.split(", ")]
        for pdf in batches:
            # columnar assembly: a cover can emit millions of rows per
            # batch at res 9 — per-row dicts dominate the kernel cost
            urls: list = []
            idxs: list = []
            chunks: list = []
            for url, idx, ring in zip(pdf["url"], pdf["airspace_idx"], pdf["ring"]):
                if ring is None or len(ring) < 4:
                    continue
                arr = np.asarray([list(p) for p in ring], dtype=np.float64)
                cov = h3_cover(arr, min_res, max_res, max_cells)
                if len(cov) == 0:
                    continue
                urls.append(url)
                idxs.append(int(idx))
                chunks.append(cov)
            if not chunks:
                yield pd.DataFrame(columns=cols)
                continue
            counts = [len(c) for c in chunks]
            flat = np.concatenate(chunks)
            yield pd.DataFrame({
                "url": np.repeat(np.asarray(urls, dtype=object), counts),
                "airspace_idx": np.repeat(
                    np.asarray(idxs, dtype=np.int32), counts),
                "h3_cell": flat[:, 0],
                "h3_res": flat[:, 1].astype(np.int32),
                "is_full": flat[:, 2].astype(bool),
            })[cols]

    return src.mapInPandas(kernel, H3_TILES_SCHEMA)
