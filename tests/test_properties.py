"""Hypothesis property tests (SURVEY §5): DMS round-trip, rewind
idempotence, kinks-scan equivalence to the scalar formulation."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openair_spark.core.coordinates import dec_to_dms, parse_coordinate
from openair_spark.core.geo import (
    boolean_clockwise, rewind_ring, ring_self_intersections, segment_intersection)


# one-arcsecond grid: the DMS text format is exact there
_arcsec_lat = st.integers(min_value=-89 * 3600, max_value=89 * 3600)
_arcsec_lon = st.integers(min_value=-179 * 3600, max_value=179 * 3600)


@settings(max_examples=300, deadline=None)
@given(_arcsec_lat, _arcsec_lon)
def test_dms_roundtrip_on_arcsecond_grid(lat_s, lon_s):
    lat = lat_s / 3600.0
    lon = lon_s / 3600.0
    text = f"{dec_to_dms(lat, 'lat')} {dec_to_dms(lon, 'lon')}"
    plon, plat = parse_coordinate(text)
    # parse_coordinate rounds to the parser's 5-dp contract
    assert abs(plat - lat) < 1e-5 + 1e-9
    assert abs(plon - lon) < 1e-5 + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.floats(-179, 179, allow_nan=False),
                          st.floats(-89, 89, allow_nan=False)),
                min_size=3, max_size=12))
def test_rewind_idempotent_and_ccw(pts):
    from hypothesis import assume

    ring = [list(p) for p in pts] + [list(pts[0])]
    # degenerate (near-zero-area) rings can read "clockwise" in BOTH
    # orientations under float shoelace — turf.booleanClockwise behaves
    # identically, so idempotence is only a property of real rings
    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    s = float(np.sum((xs[1:] - xs[:-1]) * (ys[1:] + ys[:-1])))
    assume(abs(s) > 1e-9)
    out = rewind_ring(ring)
    assert rewind_ring(out) == out        # idempotent
    if not boolean_clockwise(ring):
        assert out == ring                # CCW input untouched
    else:
        assert out == ring[::-1]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.floats(-50, 50, allow_nan=False, width=32),
                          st.floats(-50, 50, allow_nan=False, width=32)),
                min_size=4, max_size=10))
def test_kinks_matrix_equals_scalar_loop(pts):
    ring = [list(map(float, p)) for p in pts] + [list(map(float, pts[0]))]
    nseg = len(ring) - 1
    expected = []
    for i in range(nseg):
        for k in range(i, nseg):
            if abs(i - k) == 1 or i == k or (i == 0 and k == nseg - 1):
                continue
            pt = segment_intersection(ring[i], ring[i + 1], ring[k], ring[k + 1])
            if pt is not None:
                expected.append([pt[0], pt[1]])
    got = ring_self_intersections(ring)
    assert got == expected
