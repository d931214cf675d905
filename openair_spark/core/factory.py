"""Per-block airspace assembly.

Mirrors reference src/airspace-factory.ts: token-order validation
(:239-285), token-inventory validation (:293-333), last-write-wins
property fold (:335-609), look-behind VX/VD resolution (:622-645),
circle tessellation + 200 m dedup (:420-453, :699-723), DB/DA adjusted
arcs with smooth-step radius blend (:455-546, :730-784), airway buffer
(:104-156), ceiling sanity check (:651-697).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import tokenizer as tk
from .buffer import buffer_line_km
from .config import VERSION_2, ParserConfig
from .errors import ParserError
from .geo import EARTH_RADIUS_KM, bearing, circle_ring, destination, distance_km
from .jsnum import js_to_fixed, js_to_fixed_array


@dataclass
class Airspace:
    name: Optional[str] = None
    airspace_class: Optional[str] = None
    upper_ceiling: Optional[dict] = None
    lower_ceiling: Optional[dict] = None
    type: Optional[str] = None
    frequency: Optional[dict] = None
    transponder_code: Optional[int] = None
    activation_times: Optional[list] = None
    by_notam: Optional[bool] = None
    coordinates: list = field(default_factory=list)
    consumed_tokens: list = field(default_factory=list)

    def add_coordinates(self, coords) -> None:
        """6-decimal rounding on every computed coordinate
        (reference src/airspace.ts:80-87). Bulk inputs (tessellated
        circles/arcs) round vectorized; short ones stay scalar."""
        if len(coords) > 8:
            arr = js_to_fixed_array(
                np.asarray([[float(c[0]), float(c[1])] for c in coords]), 6)
            self.coordinates.extend(arr.tolist())
        else:
            for c in coords:
                self.coordinates.append(
                    [js_to_fixed(float(c[0]), 6), js_to_fixed(float(c[1]), 6)])


def validate_token_order(tokens: list, version: str) -> None:
    """Look-ahead-only order validation (src/airspace-factory.ts:239-285)."""
    allowed = tk.allowed_next(version)
    starting_ac_found = False
    max_idx = len(tokens) - 1
    for index, current in enumerate(tokens):
        if not starting_ac_found and not current.ignored:
            if current.type == tk.AC:
                starting_ac_found = True
            else:
                raise ParserError(
                    f"The first token must be of type '{tk.AC}'. "
                    f"Token '{current.type}' found on line {current.line_number}.",
                    current.line_number,
                )
        if index < max_idx:
            look = index + 1
            nxt = tokens[look]
            while nxt.ignored and look <= max_idx:
                look += 1
                nxt = tokens[look]
            if nxt.type not in allowed[current.type]:
                raise ParserError(
                    f"Token '{current.type}' on line {current.line_number} does not allow "
                    f"subsequent token '{nxt.type}' on line {nxt.line_number}",
                    nxt.line_number,
                )


def validate_token_inventory(tokens: list, version: str) -> None:
    """Required-token inventory (src/airspace-factory.ts:293-333)."""
    required = [tk.AC, tk.AN, tk.AL, tk.AH]
    if version == VERSION_2:
        required.append(tk.AY)
    present = [t.type for t in tokens]
    block_start = tokens[0].line_number if tokens else None
    missing = [r for r in required if r not in present]
    if missing:
        raise ParserError(
            f"Airspace definition block is missing required tokens: {', '.join(missing)}",
            block_start,
        )
    af = next((t for t in tokens if t.type == tk.AF), None)
    ag = next((t for t in tokens if t.type == tk.AG), None)
    if af is None and ag is not None:
        raise ParserError(
            f"Token '{tk.AG}' is present but token '{tk.AF}' is missing.",
            ag.line_number,
        )


def _fl_to_feet(ceiling: dict) -> dict:
    value, unit, datum = ceiling["value"], ceiling["unit"], ceiling["referenceDatum"]
    if unit == "FL":
        value = value * 100
        unit = "FT"
        datum = "MSL"
    return {"value": value, "unit": unit, "referenceDatum": datum}


def _feeted(ceiling: dict) -> dict:
    if ceiling["unit"] == "M":
        return {"value": ceiling["value"] * tk.METERS_TO_FEET, "unit": "FT",
                "referenceDatum": ceiling["referenceDatum"]}
    return ceiling


def _enforce_sane_limits(airspace: Airspace, line_number: int) -> None:
    """Lower <= upper when datums match (src/airspace-factory.ts:663-697)."""
    low, up = airspace.lower_ceiling, airspace.upper_ceiling
    if low and up and low["referenceDatum"] == up["referenceDatum"]:
        cmp_up = _feeted(_fl_to_feet(up))
        cmp_low = _feeted(_fl_to_feet(low))
        if cmp_low["value"] > cmp_up["value"]:
            raise ParserError("Lower limit must be less than upper limit", line_number)


def _find_preceding(tokens: list, index: int, token_type: str):
    """getNextToken lookAhead=false: nearest preceding token of type,
    including the current index (src/airspace-factory.ts:622-645)."""
    for i in range(index, -1, -1):
        if tokens[i].type == token_type:
            return tokens[i]
    return None


def _remove_nearest_coordinates(coords: np.ndarray, min_allowed_distance_m: float,
                                line_number: int) -> list:
    """Greedy first-kept scan against *all kept* points
    (src/airspace-factory.ts:699-723)."""
    buffer_km = min_allowed_distance_m / 1000.0
    arr = np.asarray(coords, dtype=np.float64)
    kept: list = []
    if len(arr) <= 2048:
        # haversine(p, q) >= R * |dlat| exactly (a >= sin^2(dlat/2)),
        # so pairs outside the latitude band provably exceed the buffer
        # and skip the trig: the dense n^2 haversine matrix (345 calls
        # x ~360-point tessellated rings per 1k bench pages) was the
        # parse kernel's single hottest line. The 1.001 slack swallows
        # the radians(a)-radians(b) vs radians(a-b) rounding gap.
        n_pts = len(arr)
        latr = np.radians(arr[:, 1])
        band = buffer_km / EARTH_RADIUS_KM * 1.001 + 1e-12
        cand = np.abs(latr[:, None] - latr[None, :]) <= band
        np.fill_diagonal(cand, False)
        dup = np.zeros((n_pts, n_pts), dtype=bool)
        ii, jj = np.nonzero(cand)
        if len(ii):
            dup[ii, jj] = distance_km(arr[ii], arr[jj]) <= buffer_km
        # common case (tessellated rings whose spacing exceeds the
        # buffer): no off-diagonal pair is close, the greedy scan keeps
        # everything — skip the per-point python loop entirely. Points
        # with no close neighbor at all can never be dropped NOR drop
        # anyone, so the sequential scan only needs the involved subset.
        involved = np.flatnonzero(dup.any(axis=0))
        keep_mask = np.ones(len(arr), dtype=bool)
        if len(involved):
            sub = dup[np.ix_(involved, involved)]
            kept_sub = np.zeros(len(involved), dtype=bool)
            for i in range(len(involved)):
                if not bool((sub[:, i] & kept_sub).any()):
                    kept_sub[i] = True
            keep_mask[involved] = kept_sub
        kept = [[float(c[0]), float(c[1])] for c in arr[keep_mask]]
    else:
        # huge geometry_detail: avoid the O(n^2) matrix inside a worker;
        # test each candidate against the kept prefix (same elementwise
        # haversine, bit-identical per pair)
        kept_buf = np.empty_like(arr)
        nk = 0
        for i, c in enumerate(arr):
            if nk and bool((distance_km(kept_buf[:nk], arr[i]) <= buffer_km).any()):
                continue
            kept_buf[nk] = arr[i]
            nk += 1
            kept.append([float(c[0]), float(c[1])])
    if len(kept) < 4:
        raise ParserError("The polygon dimensions are too small to create a polygon.", line_number)
    return kept


def create_adjusted_arc(start, center, end, clockwise: bool, steps: int) -> list:
    """Arc with constant start-radius and a smooth-step radius blend to
    the end radius over the final quarter; last point forced to the
    exact end coordinate (src/airspace-factory.ts:730-784)."""
    start_bearing = float(bearing(center, start))
    end_bearing = float(bearing(center, end))
    start_radius = float(distance_km(center, start))
    end_radius = float(distance_km(center, end))
    if clockwise:
        if end_bearing < start_bearing:
            end_bearing += 360.0
    else:
        if end_bearing > start_bearing:
            end_bearing -= 360.0
    coords: list = []
    for i in range(steps + 1):
        fraction = i / steps
        current_radius = start_radius
        if fraction > 0.75:
            tf = (fraction - 0.75) * 4.0
            smooth = tf * tf * (3.0 - 2.0 * tf)
            current_radius = start_radius + (end_radius - start_radius) * smooth
        brg = start_bearing + (end_bearing - start_bearing) * fraction
        if brg > 180.0:
            brg -= 360.0
        if brg < -180.0:
            brg += 360.0
        pt = destination(center, current_radius, brg, units="kilometers")
        coords.append([float(pt[0]), float(pt[1])])
    coords[-1] = [float(end[0]), float(end[1])]
    return coords


def create_airspace(tokens: list, config: ParserConfig) -> Optional[Airspace]:
    """Fold one block's tokens into an Airspace
    (reference AirspaceFactory.createAirspace, src/airspace-factory.ts:80-130)."""
    airspace = Airspace()
    if config.version == VERSION_2:
        airspace.by_notam = False

    validate_token_order(tokens, config.version)
    validate_token_inventory(tokens, config.version)

    is_airway = False
    airway_width: Optional[float] = None
    airway_segments: list = []
    current_line = None
    has_build_tokens = False

    for index, token in enumerate(tokens):
        current_line = token.line_number
        t = token.type
        md = token.metadata
        if t == tk.AC:
            airspace.airspace_class = md["class"]
        elif t == tk.AN:
            airspace.name = md["name"]
        elif t == tk.AH:
            airspace.upper_ceiling = md["altitude"]
            _enforce_sane_limits(airspace, current_line)
        elif t == tk.AL:
            airspace.lower_ceiling = md["altitude"]
            _enforce_sane_limits(airspace, current_line)
        elif t == tk.DP:
            # raw parsed coordinate appended without re-rounding (:367-373)
            airspace.coordinates.append(list(md["coordinate"]))
        elif t == tk.DY:
            airway_segments.append(list(md["coordinate"]))
        elif t == tk.VW:
            is_airway = True
            airway_width = md["width"]
        elif t in (tk.VD, tk.VX, tk.EOF, tk.COMMENT, tk.BLANK, tk.SKIPPED):
            pass
        elif t == tk.DC:
            vx = _find_preceding(tokens, index, tk.VX)
            if vx is None:
                raise ParserError("Preceding VX token not found.", current_line)
            radius_m = md["radius"] * 1852.0
            ring = circle_ring(vx.metadata["coordinate"], radius_m, config.geometry_detail)
            refined = _remove_nearest_coordinates(ring, 200.0, current_line)
            refined.append(refined[0])
            airspace.add_coordinates(refined)
        elif t in (tk.DB, tk.DA):
            vd = _find_preceding(tokens, index, tk.VD)
            clockwise = vd.metadata["clockwise"] if vd is not None else True
            vx = _find_preceding(tokens, index, tk.VX)
            if vx is None:
                raise ParserError("Preceding VX token not found.", current_line)
            center = vx.metadata["coordinate"]
            if t == tk.DB:
                start = md["startCoordinate"]
                end = md["endCoordinate"]
            else:
                radius_km = md["radius"] / 1000.0
                start = [float(v) for v in destination(center, radius_km, md["startBearing"])]
                end = [float(v) for v in destination(center, radius_km, md["endBearing"])]
            arc = create_adjusted_arc(start, center, end, clockwise, config.geometry_detail)
            airspace.add_coordinates(arc)
        elif t == tk.AY:
            airspace.type = md["type"]
        elif t == tk.AF:
            if airspace.frequency is None:
                airspace.frequency = {}
            airspace.frequency["value"] = md["frequency"]
        elif t == tk.AG:
            if airspace.frequency is None:
                airspace.frequency = {}
            airspace.frequency["name"] = md["name"]
        elif t == tk.AX:
            airspace.transponder_code = md["code"]
        elif t == tk.AA:
            activation = md["activation"]
            if activation == tk.BY_NOTAM_ACTIVATION:
                if airspace.activation_times:
                    raise ParserError(
                        "Additional activation times are not allowed with BY NOTAM activation.",
                        current_line,
                    )
                airspace.by_notam = True
            else:
                if airspace.activation_times is None:
                    airspace.activation_times = []
                airspace.activation_times.append(activation)
        else:
            raise ParserError(f"Unknown token '{t}'", current_line)

        if not token.ignored:
            has_build_tokens = True
        airspace.consumed_tokens.append(token)

    if is_airway:
        if airway_width is None or len(airway_segments) == 0:
            raise ParserError("Airway definition is missing required tokens.", current_line)
        buffer_km = (airway_width * 1.852) / 2.0
        try:
            ring = buffer_line_km(airway_segments, buffer_km)
        except ValueError as err:
            raise ParserError(str(err), current_line) from None
        airspace.add_coordinates(ring)

    return airspace if has_build_tokens else None
