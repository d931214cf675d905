"""Great-circle geometry kernels (numpy, float64).

Re-implements the turf.js ^7 primitives the reference leans on
(imports at reference src/airspace-factory.ts:2-9 and
src/geojson-polygon.ts:2-13) with identical operation order so double
results match bit-for-bit:

  earth radius R = 6_371_008.8 m (turf's constant)
  degreesToRadians(d) = (d % 360) * pi/180        (turf applies modulo)
  radiansToDegrees(r) = (r % 2pi) * 180/pi
  bearing / distance (haversine) / destination / circle(i * -360/steps)
  booleanClockwise (shoelace), rewind, ring area (geojson-area), envelope

All functions accept scalars or numpy arrays; modulo uses fmod (C
semantics, sign-preserving) to match the JS `%` operator.
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6371008.8
EARTH_RADIUS_KM = 6371.0088


def deg2rad(d):
    return np.fmod(d, 360.0) * (math.pi / 180.0)


def rad2deg(r):
    return np.fmod(r, 2.0 * math.pi) * (180.0 / math.pi)


def bearing(start, end):
    """turf.bearing: forward azimuth start->end in degrees (-180, 180].

    start/end: (lon, lat) pairs (arrays broadcast elementwise).
    """
    lon1 = deg2rad(np.asarray(start, dtype=np.float64)[..., 0])
    lon2 = deg2rad(np.asarray(end, dtype=np.float64)[..., 0])
    lat1 = deg2rad(np.asarray(start, dtype=np.float64)[..., 1])
    lat2 = deg2rad(np.asarray(end, dtype=np.float64)[..., 1])
    a = np.sin(lon2 - lon1) * np.cos(lat2)
    b = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(lon2 - lon1)
    return rad2deg(np.arctan2(a, b))


def distance_km(from_pt, to_pt):
    """turf.distance with units kilometers (haversine on R)."""
    f = np.asarray(from_pt, dtype=np.float64)
    t = np.asarray(to_pt, dtype=np.float64)
    dlat = deg2rad(t[..., 1] - f[..., 1])
    dlon = deg2rad(t[..., 0] - f[..., 0])
    lat1 = deg2rad(f[..., 1])
    lat2 = deg2rad(t[..., 1])
    a = np.power(np.sin(dlat / 2.0), 2) + np.power(np.sin(dlon / 2.0), 2) * np.cos(lat1) * np.cos(lat2)
    rad = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return rad * EARTH_RADIUS_KM


def destination(origin, dist, bearing_deg, units="kilometers"):
    """turf.destination — spherical forward geodesic.

    origin: (lon, lat); dist scalar/array; bearing_deg scalar/array.
    Returns stacked (lon, lat) array (last axis 2).
    """
    o = np.asarray(origin, dtype=np.float64)
    lon1 = deg2rad(o[..., 0])
    lat1 = deg2rad(o[..., 1])
    brad = deg2rad(np.asarray(bearing_deg, dtype=np.float64))
    if units == "kilometers":
        radians = np.asarray(dist, dtype=np.float64) / EARTH_RADIUS_KM
    elif units == "meters":
        radians = np.asarray(dist, dtype=np.float64) / EARTH_RADIUS_M
    else:
        raise ValueError(units)
    lat2 = np.arcsin(np.sin(lat1) * np.cos(radians) + np.cos(lat1) * np.sin(radians) * np.cos(brad))
    lon2 = lon1 + np.arctan2(
        np.sin(brad) * np.sin(radians) * np.cos(lat1),
        np.cos(radians) - np.sin(lat1) * np.sin(lat2),
    )
    return np.stack([rad2deg(lon2), rad2deg(lat2)], axis=-1)


def circle_ring(center, radius_m: float, steps: int) -> np.ndarray:
    """turf.circle ring (closed): bearings (i * -360)/steps for i in [0, steps)
    then the first point repeated (reference handleDcToken,
    src/airspace-factory.ts:435-439)."""
    i = np.arange(steps, dtype=np.float64)
    bearings = (i * -360.0) / steps
    pts = destination(np.asarray(center, dtype=np.float64), radius_m, bearings, units="meters")
    return np.vstack([pts, pts[0:1]])


def boolean_clockwise(ring) -> bool:
    """turf.booleanClockwise: shoelace sum (x2-x1)*(y2+y1) > 0."""
    r = np.asarray(ring, dtype=np.float64)
    x = r[:, 0]
    y = r[:, 1]
    s = np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))
    return bool(s > 0)


def rewind_ring(ring: list) -> list:
    """turf.rewind({reverse:false}) on an outer ring: force counter-clockwise
    (reference src/geojson-polygon.ts:204-208)."""
    if boolean_clockwise(ring):
        return ring[::-1]
    return ring


def ring_area_m2(ring) -> float:
    """turf.area ring term (geojson-area algorithm, R=6371008.8).

    Used only to select the largest polygon after unkinking
    (reference src/geojson-polygon.ts:110-132)."""
    coords = list(ring)
    n = len(coords) - 1
    if n <= 2:
        return 0.0
    factor = math.pi / 180.0
    total = 0.0
    for i in range(n):
        lower = coords[i]
        middle = coords[(i + 1) % n]
        upper = coords[(i + 2) % n]
        total += (upper[0] * factor - lower[0] * factor) * math.sin(middle[1] * factor)
    return abs(total * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def envelope_ring(coords) -> list:
    """turf.envelope: bbox polygon ring [[w,s],[e,s],[e,n],[w,n],[w,s]]."""
    a = np.asarray(coords, dtype=np.float64)
    w, s = a[:, 0].min(), a[:, 1].min()
    e, n = a[:, 0].max(), a[:, 1].max()
    return [[w, s], [e, s], [e, n], [w, n], [w, s]]


def segment_intersection(p1, p2, p3, p4):
    """turf.kinks' line intersection: strict interior crossing of segments
    (p1,p2) x (p3,p4); returns (x, y) or None. Matches the uA/uB in (0,1)
    exclusion so shared endpoints never count."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = p3
    x4, y4 = p4
    denom = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1)
    if denom == 0:
        return None
    a = y1 - y3
    b = x1 - x3
    num1 = (x4 - x3) * a - (y4 - y3) * b
    num2 = (x2 - x1) * a - (y2 - y1) * b
    ua = num1 / denom
    ub = num2 / denom
    if 0 < ua < 1 and 0 < ub < 1:
        return (x1 + ua * (x2 - x1), y1 + ua * (y2 - y1))
    return None


def segment_intersection_det(p1, p2, p3, p4):
    """simplepolygon's homogeneous/determinant line intersection (used by
    turf.unkinkPolygon) — same crossings as segment_intersection but
    different low-order float bits; verified against
    reference tests/fixtures/fixed-self-intersecting.json."""
    if segment_intersection(p1, p2, p3, p4) is None:
        return None
    x0, y0 = p1
    x1, y1 = p2
    x2, y2 = p3
    x3, y3 = p4
    denom = (x0 - x1) * (y2 - y3) - (y0 - y1) * (x2 - x3)
    if denom == 0:
        return None
    x4 = ((x0 * y1 - y0 * x1) * (x2 - x3) - (x0 - x1) * (x2 * y3 - y2 * x3)) / denom
    y4 = ((x0 * y1 - y0 * x1) * (y2 - y3) - (y0 - y1) * (x2 * y3 - y2 * x3)) / denom
    return (x4, y4)


def ring_self_intersections(ring) -> list:
    """turf.kinks on a closed ring: all interior segment-pair crossings,
    in the reference's double-loop order (i over segments, k from i),
    skipping adjacent segments and the first/last pair.

    Vectorized over the (i, k) pair matrix in fixed-size i-row blocks —
    identical arithmetic to segment_intersection, so results are
    bit-equal to the scalar double loop (np.argwhere within a block
    yields row-major (i, k) order, and blocks run in ascending i, so
    global order = loop order). Blocking caps worker memory at
    O(block * nseg) instead of O(nseg^2): crawl pages are untrusted
    input and a pathological ring must not OOM an Arrow worker.
    """
    coords = np.asarray(ring, dtype=np.float64)
    nseg = len(coords) - 1
    if nseg < 3:
        return []
    x1s, y1s = coords[:-1, 0], coords[:-1, 1]
    x2s, y2s = coords[1:, 0], coords[1:, 1]

    k = np.arange(nseg)[None, :]
    x3, y3, x4, y4 = x1s[None, :], y1s[None, :], x2s[None, :], y2s[None, :]
    out = []
    block = max(1, 4_000_000 // nseg)
    for lo in range(0, nseg, block):
        hi = min(lo + block, nseg)
        i = np.arange(lo, hi)[:, None]
        valid = (k > i) & (np.abs(i - k) != 1) & ~((i == 0) & (k == nseg - 1))
        x1, y1 = x1s[lo:hi, None], y1s[lo:hi, None]
        x2, y2 = x2s[lo:hi, None], y2s[lo:hi, None]
        denom = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1)
        a = y1 - y3
        b = x1 - x3
        with np.errstate(divide="ignore", invalid="ignore"):
            ua = ((x4 - x3) * a - (y4 - y3) * b) / denom
            ub = ((x2 - x1) * a - (y2 - y1) * b) / denom
        hit = valid & (denom != 0) & (ua > 0) & (ua < 1) & (ub > 0) & (ub < 1)
        for ii, kk in np.argwhere(hit):
            u = ua[ii, kk]
            gi = lo + ii
            out.append([x1s[gi] + u * (x2s[gi] - x1s[gi]),
                        y1s[gi] + u * (y2s[gi] - y1s[gi])])
    return out
