"""Cell indexes (from scratch — no geo libraries in this environment).

  s2.py       S2 cell ids per the published spec (cube faces, quadratic
              ST projection, Hilbert curve) — vectorized point->cell.
  h3.py       bit-compatible H3 (icosahedral gnomonic aperture-7) from
              scratch: tables derived from the published face geometry,
              validated against the documented example cells
              (latLngToCell/parent/gridDisk anchors, pentagon list).
  quadkey.py  lat/lon quadtree cells in pure floor arithmetic — the
              SQL-expressible index used by the DuckDB correctness oracle.
  cover.py    compact polygon covers over any of the above.
"""
