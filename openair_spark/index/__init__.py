"""Cell indexes (from scratch — no geo libraries in this environment).

  s2.py       S2 cell ids per the published spec (cube faces, quadratic
              ST projection, Hilbert curve) — vectorized point->cell.
  hexgrid.py  H3-style aperture-7 hexagonal hierarchy (res 5-9). IDs are
              NOT Uber-H3 interoperable (bit-compatible H3 requires the
              icosahedral gnomonic face tables); the hierarchy, neighbor
              and cover algebra match, which is what the join layer needs.
  quadkey.py  lat/lon quadtree cells in pure floor arithmetic — the
              SQL-expressible index used by the DuckDB correctness oracle.
  cover.py    compact polygon covers over any of the above.
"""
