"""Airspace -> GeoJSON feature (reference src/airspace.ts:89-301).

Implements the insufficient-coordinate and completeness checks, the
polygon build with non-altering adjustments (dedup -> despike -> RHR),
the optional fix path, optional validation, LINESTRING bypass, and the
feature/property assembly. Feature ids are deterministic surrogates
(sha2 of a caller-provided seed) instead of uuid.v4 — the reference's
own tests delete ids before comparison (tests/parser.test.ts:74-75).
"""

from __future__ import annotations

import hashlib
from typing import Optional

from .config import LINESTRING, POLYGON, ParserConfig
from .errors import ParserError
from .factory import Airspace
from . import polygon as gp


def _surrogate_id(seed: str) -> str:
    """Deterministic uuid-shaped id derived from a seed string."""
    h = hashlib.sha256(seed.encode("utf-8")).hexdigest()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _linestring_geometry(coordinates: list) -> Optional[dict]:
    if len(coordinates) < 2:
        return None
    return {"type": "LineString", "coordinates": [list(c) for c in coordinates]}


def _validate_airspace_polygon(ring: list) -> tuple[bool, list]:
    try:
        gp.validate_polygon(ring)
        return True, []
    except ValueError as err:
        if "Geometry is invalid due to self intersection" in str(err):
            return False, gp.get_self_intersections(ring)
        return False, []


def build_polygon_geometry(airspace: Airspace, config: ParserConfig) -> dict:
    """reference Airspace.buildPolygonGeometry (src/airspace.ts:158-250)."""
    line_number = airspace.consumed_tokens[0].line_number
    ring = None
    try:
        ring = gp.create_polygon_ring([list(c) for c in airspace.coordinates])
        ring = gp.remove_duplicate_points(ring, config.consume_duplicate_buffer)
        ring = gp.remove_intermediate_points(ring)
        ring = gp.rewind_ring(ring)
    except Exception as err:
        if config.fix_geometry:
            try:
                ring = gp.create_fixed_polygon([list(c) for c in airspace.coordinates],
                                               config.consume_duplicate_buffer)
            except SyntaxError as serr:
                raise ParserError(str(serr), line_number,
                                  geometry=_linestring_geometry(airspace.coordinates)) from None
        else:
            raise ParserError(
                f"Geometry of airspace '{airspace.name}' starting on line {line_number} "
                f"is invalid. {err}",
                line_number,
                geometry=_linestring_geometry(airspace.coordinates),
            ) from None

    if config.fix_geometry:
        try:
            ring = gp.create_fixed_polygon(ring, config.consume_duplicate_buffer)
        except SyntaxError as serr:
            raise ParserError(str(serr), line_number,
                              geometry=_linestring_geometry(airspace.coordinates)) from None

    if config.validate_geometry:
        is_valid, self_intersections = _validate_airspace_polygon(ring)
        if not is_valid or self_intersections:
            if self_intersections:
                raise ParserError(
                    f"Geometry of airspace '{airspace.name}' starting on line {line_number} "
                    "is invalid due to self intersection.",
                    line_number,
                    geometry=_linestring_geometry(airspace.coordinates),
                    self_intersections=self_intersections,
                )
            raise ParserError(
                f"Geometry of airspace '{airspace.name}' starting on line {line_number} is invalid.",
                line_number,
                geometry=_linestring_geometry(airspace.coordinates),
            )
    return {"type": "Polygon", "coordinates": [ring]}


def as_geojson(airspace: Airspace, config: ParserConfig, id_seed: str = "") -> dict:
    """reference Airspace.asGeoJson (src/airspace.ts:89-156)."""
    ac_token = airspace.consumed_tokens[0]
    line_number = ac_token.line_number
    coords = airspace.coordinates

    if len(coords) <= 2 or (
        len(coords) == 3 and coords[0][0] == coords[2][0] and coords[0][1] == coords[2][1]
    ):
        raise ParserError(
            f"Geometry of airspace '{airspace.name}' starting on line {line_number} "
            f"has insufficient number of coordinates: {len(coords)}",
            line_number,
            geometry=_linestring_geometry(coords),
        )
    complete = (
        airspace.name is not None
        and airspace.airspace_class is not None
        and airspace.upper_ceiling is not None
        and airspace.lower_ceiling is not None
        and len(coords) > 0
    )
    if not complete:
        raise ParserError(
            f"Airspace '{airspace.name}' starting on line {line_number} is missing required properties",
            line_number,
            geometry=_linestring_geometry(coords),
        )

    properties: dict = {
        "id": _surrogate_id(id_seed + "|props"),
        "name": airspace.name,
        "class": airspace.airspace_class,
        "upperCeiling": airspace.upper_ceiling,
        "lowerCeiling": airspace.lower_ceiling,
    }
    if airspace.type is not None:
        properties["type"] = airspace.type
    if airspace.frequency is not None:
        properties["frequency"] = airspace.frequency
    if airspace.transponder_code is not None:
        properties["transponderCode"] = airspace.transponder_code
    if airspace.activation_times is not None:
        properties["activationTimes"] = airspace.activation_times
    if airspace.by_notam is not None:
        properties["byNotam"] = airspace.by_notam
    if config.include_openair:
        properties["openair"] = "".join(t.line + "\n" for t in airspace.consumed_tokens)

    if config.output_geometry == POLYGON:
        geometry = build_polygon_geometry(airspace, config)
    else:
        geometry = _linestring_geometry(coords)

    return {
        "type": "Feature",
        "id": _surrogate_id(id_seed + "|feature"),
        "properties": properties,
        "geometry": geometry,
    }
