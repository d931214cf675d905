"""Vectorized point-in-polygon (ray cast), the exact-join kernel behind
the salted broadcast PIP join (north rule).

Even-odd rule with the standard half-open edge convention
(y1 <= y < y2), numpy-vectorized over points x edges. Boundary points
follow the half-open convention deterministically (same convention is
encoded in the DuckDB oracle where PIP joins are oracle-checked on
rectangles, where the convention reduces to closed-left/open-right
range predicates).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px, py, ring) -> np.ndarray:
    """Boolean mask: which (px, py) points fall inside the closed ring.

    px, py: (N,) float arrays (lon, lat); ring: (M, 2) closed ring.
    Vectorized as an (N, M-1) crossing matrix — fine for the per-task
    candidate sets the cell join produces (cells bound M and N).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    yp = py[:, None]
    xp = px[:, None]
    crosses = ((y1 <= yp) & (yp < y2)) | ((y2 <= yp) & (yp < y1))
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at_y = x1 + (yp - y1) * (x2 - x1) / (y2 - y1)
    hits = crosses & (xp < x_at_y)
    return (hits.sum(axis=1) % 2).astype(bool)
