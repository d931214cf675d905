"""Geodesic line buffer (airway geometry, reference G4).

The reference builds airway polygons with turf.buffer
(src/airspace-factory.ts:136-156): project to a d3 azimuthal-equidistant
plane centered on the feature's bbox center (scale = earth radius, the
d3 default translate [480,250] and inverted screen y), run a JTS-style
round-cap/round-join offset curve (quadrantSegments=8, vertex snap
distance = distance*1e-6), unproject.

This module re-implements that chain from the published d3-geo and JTS
algorithms. Gold fixture: reference tests/fixtures/awy-result.json
(35-point ring for a single-segment airway).
"""

from __future__ import annotations

import math

TAU = 2.0 * math.pi
EARTH_RADIUS_M = 6371008.8
_TX, _TY = 480.0, 250.0  # d3 default translate


class Aeqd:
    """d3 geoAzimuthalEquidistant().rotate([-lon0, -lat0]).scale(R)."""

    def __init__(self, lon0: float, lat0: float, scale: float = EARTH_RADIUS_M):
        self.delta_lambda = math.radians(-lon0)
        self.delta_phi = math.radians(-lat0)
        self.cos_dphi = math.cos(self.delta_phi)
        self.sin_dphi = math.sin(self.delta_phi)
        self.k = scale

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        lam = math.radians(lon) + self.delta_lambda
        if lam > math.pi:
            lam -= TAU
        elif lam < -math.pi:
            lam += TAU
        phi = math.radians(lat)
        cos_phi = math.cos(phi)
        x = math.cos(lam) * cos_phi
        y = math.sin(lam) * cos_phi
        z = math.sin(phi)
        kk = z * self.cos_dphi + x * self.sin_dphi
        lam2 = math.atan2(y, x * self.cos_dphi - z * self.sin_dphi)
        phi2 = math.asin(max(-1.0, min(1.0, kk)))
        # azimuthal equidistant raw
        cx, cy = math.cos(lam2), math.cos(phi2)
        cosc = cx * cy
        c = math.acos(max(-1.0, min(1.0, cosc)))
        scale = (c / math.sin(c)) if c != 0.0 else 0.0
        px = scale * cy * math.sin(lam2)
        py = scale * math.sin(phi2)
        return (px * self.k + _TX, _TY - py * self.k)

    def invert(self, px: float, py: float) -> tuple[float, float]:
        x = (px - _TX) / self.k
        y = (_TY - py) / self.k
        z = math.sqrt(x * x + y * y)
        c = z
        sc, cc = math.sin(c), math.cos(c)
        lam2 = math.atan2(x * sc, z * cc)
        phi2 = math.asin((y * sc / z) if z != 0.0 else 0.0)
        # inverse phi rotation (deltaGamma = 0)
        cos_phi = math.cos(phi2)
        x3 = math.cos(lam2) * cos_phi
        y3 = math.sin(lam2) * cos_phi
        z3 = math.sin(phi2)
        k3 = z3  # z*cos(deltaGamma) - y*sin(deltaGamma), gamma=0
        lam = math.atan2(y3, x3 * self.cos_dphi + k3 * self.sin_dphi)
        phi = math.asin(max(-1.0, min(1.0, k3 * self.cos_dphi - x3 * self.sin_dphi)))
        lam -= self.delta_lambda
        if lam > math.pi:
            lam -= TAU
        elif lam < -math.pi:
            lam += TAU
        return (math.degrees(lam), math.degrees(phi))


class _SegList:
    """JTS OffsetSegmentString: consecutive near-duplicate filtering."""

    def __init__(self, min_vertex_distance: float):
        self.pts: list = []
        self.min_dist = min_vertex_distance

    def add(self, pt) -> None:
        if self.pts:
            last = self.pts[-1]
            if math.hypot(pt[0] - last[0], pt[1] - last[1]) < self.min_dist:
                return
        self.pts.append([pt[0], pt[1]])

    def close_ring(self) -> None:
        if not self.pts:
            return
        if self.pts[0] != self.pts[-1]:
            self.pts.append(list(self.pts[0]))


def _offset_segment(p0, p1, side_sign: float, distance: float):
    """JTS computeOffsetSegment: offset both endpoints by the rotated
    unit normal (left = +90 in plane coordinates)."""
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]
    length = math.sqrt(dx * dx + dy * dy)
    ux = side_sign * distance * dx / length
    uy = side_sign * distance * dy / length
    return ([p0[0] - uy, p0[1] + ux], [p1[0] - uy, p1[1] + ux])


def _add_directed_fillet(seg_list: _SegList, p, start_angle: float, end_angle: float,
                         clockwise: bool, radius: float, quadrant_segments: int = 8) -> None:
    """JTS addDirectedFillet: interior fillet points only, float-
    accumulated angle loop (matches jsts exactly)."""
    direction_factor = -1.0 if clockwise else 1.0
    fillet_quantum = (math.pi / 2.0) / quadrant_segments
    total_angle = abs(start_angle - end_angle)
    n_segs = int(total_angle / fillet_quantum + 0.5)
    if n_segs < 1:
        return
    angle_inc = total_angle / n_segs
    angle = angle_inc
    while angle < total_angle:
        a = start_angle + direction_factor * angle
        seg_list.add((p[0] + radius * math.cos(a), p[1] + radius * math.sin(a)))
        angle += angle_inc


def _line_offset_ring(pts: list, distance: float, quadrant_segments: int = 8) -> list:
    """Round-cap, round-join offset-curve ring around an open polyline in
    the projected plane (JTS OffsetCurveBuilder line-buffer curve).

    Exact for the single-segment case (the only gold fixture); for
    multi-segment lines, outside turns get round-join fillets and inside
    turns keep both offset points (the later unkink/largest-ring cleanup
    in the caller's pipeline resolves any local self-intersections).
    """
    seg_list = _SegList(distance * 1.0e-6)
    n = len(pts)

    def add_side(points: list) -> None:
        # traverse `points` adding the left-side offset curve
        prev_off = None
        prev_dir = None
        for i in range(len(points) - 1):
            p0, p1 = points[i], points[i + 1]
            off0, off1 = _offset_segment(p0, p1, 1.0, distance)
            direction = math.atan2(p1[1] - p0[1], p1[0] - p0[0])
            if prev_off is None:
                seg_list.add(off0)
            else:
                # join at p0 between prev segment and this one
                turn = _angle_diff(prev_dir, direction)
                if turn < 0:  # outside turn (left offsets separate) -> fillet
                    _add_directed_fillet(
                        seg_list, p0,
                        prev_dir + math.pi / 2.0, direction + math.pi / 2.0,
                        clockwise=True, radius=distance,
                        quadrant_segments=quadrant_segments)
                seg_list.add(off0)
            seg_list.add(off1)
            prev_off = off1
            prev_dir = direction

    # forward side
    add_side(pts)
    # end cap at last point
    p0, p1 = pts[n - 2], pts[n - 1]
    angle = math.atan2(p1[1] - p0[1], p1[0] - p0[0])
    _add_directed_fillet(seg_list, p1, angle + math.pi / 2.0, angle - math.pi / 2.0,
                         clockwise=True, radius=distance,
                         quadrant_segments=quadrant_segments)
    off_l, off_r = _offset_segment(p0, p1, -1.0, distance)
    seg_list.add(off_r)
    # reverse side
    add_side(list(reversed(pts)))
    # end cap at first point
    p0r, p1r = pts[1], pts[0]
    angle_r = math.atan2(p1r[1] - p0r[1], p1r[0] - p0r[0])
    _add_directed_fillet(seg_list, p1r, angle_r + math.pi / 2.0, angle_r - math.pi / 2.0,
                         clockwise=True, radius=distance,
                         quadrant_segments=quadrant_segments)
    seg_list.close_ring()
    return seg_list.pts


def _angle_diff(a: float, b: float) -> float:
    d = b - a
    while d > math.pi:
        d -= TAU
    while d < -math.pi:
        d += TAU
    return d


def buffer_line_km(segments: list, buffer_km: float) -> list:
    """turf.buffer(lineString(segments), km) -> flattened polygon ring
    in lon/lat (unrounded; the caller applies the 6-dp rounding).

    Raises ValueError('Failed to create polygon from airway definition.
    Invalid geometry.') semantics are handled by the caller; here a
    degenerate input raises ValueError.
    """
    if len(segments) < 2:
        raise ValueError("Airway definition is missing required tokens.")
    lons = [p[0] for p in segments]
    lats = [p[1] for p in segments]
    # turf.center = bbox midpoint
    lon0 = (min(lons) + max(lons)) / 2.0
    lat0 = (min(lats) + max(lats)) / 2.0
    proj = Aeqd(lon0, lat0)
    projected = [list(proj.forward(p[0], p[1])) for p in segments]
    # buffer distance: km -> radians -> meters == km*1000 (turf buffer)
    distance_m = (buffer_km / 6371.0088) * EARTH_RADIUS_M
    ring = _line_offset_ring(projected, distance_m)
    # JTS's noder splits the closed curve at its origin vertex, so the
    # emitted shell starts at the curve's *second* vertex (verified
    # against the awy-result.json gold fixture): rotate by one.
    open_ring = ring[:-1]
    rotated = open_ring[1:] + open_ring[:1]
    rotated.append(rotated[0])
    out = [list(proj.invert(p[0], p[1])) for p in rotated]
    # Multi-segment polylines with inside turns leave local
    # self-intersections in the raw offset curve (JTS resolves them in
    # its noder/polygonizer; single-segment curves — the gold fixture —
    # have none). Emulate that with the outer-boundary walk over the
    # noded curve so airway polygons are always simple AND cover every
    # segment (largest-sub-ring would drop a lobe).
    from .polygon import outer_boundary_ring

    return outer_boundary_ring(out)
