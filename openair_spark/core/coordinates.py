"""Coordinate parsing + DMS formatting.

Absorbs the behavior of the reference's external dependency
``@openaip/coordinate-parser`` ^0.32.2 (used at reference
src/tokens/dp-token.ts:38-39 and friends) as evidenced by the fixture
corpus:

  - colon DMS            ``54:25:00 N 010:40:00 E``  -> 54.41667, 10.66667
  - colon deg + dec-min  ``29:58.917 N 081:59.533 W``
  - compact DMS          ``265644.00N 0500434.00E`` / ``261706.56N 0510440.74E``
  - decimal degrees      ``46.0 N 8.8 E`` / ``46.0, 8.8`` (README-documented)

Output decimal degrees are rounded to 5 decimals (the parser's default
precision; evidenced by ``10:40:00 E -> 10.66667`` in
reference tests/fixtures/polygon-result.json). Minutes/seconds == 60 are
rejected (reference tests/parser.test.ts:517-544).

DMS output formatting mirrors reference src/geojson-to-openair.ts:124-161
(integer seconds with carry at 60, %02d/%03d zero padding).
"""

from __future__ import annotations

import math
import re

from .jsnum import js_math_round, js_to_fixed

PRECISION = 5

# deg:min:sec with optional decimal seconds, e.g. "54:25:00 N" / "54:25:00.5 N"
_RE_DMS = re.compile(
    r"^(\d{1,3}):(\d{1,2}):(\d{1,2}(?:\.\d+)?)\s*([NSEW])$"
)
# deg:decimal-minutes, e.g. "29:58.917 N"
_RE_DM = re.compile(r"^(\d{1,3}):(\d{1,2}(?:\.\d+)?)\s*([NSEW])$")
# compact DMS, e.g. "251546.00N" (lat) / "0503852.00E" (lon)
_RE_COMPACT = re.compile(r"^(\d{6,7})(?:\.(\d+))?\s*([NSEW])$")
# decimal degrees with hemisphere, e.g. "46.0 N"
_RE_DEC_H = re.compile(r"^(\d{1,3}(?:\.\d+)?)\s*([NSEW])$")
# plain signed decimal, e.g. "46.0" / "-8.25"
_RE_DEC = re.compile(r"^[+-]?\d{1,3}(?:\.\d+)?$")


class CoordinateParseError(ValueError):
    pass


def _axis_value(deg: float, minutes: float, seconds: float, hemi: str) -> float:
    if minutes >= 60 or seconds >= 60:
        raise CoordinateParseError("minutes/seconds out of range")
    value = deg + minutes / 60.0 + seconds / 3600.0
    if hemi in ("S", "W"):
        value = -value
    limit = 90.0 if hemi in ("N", "S") else 180.0
    if abs(value) > limit:
        raise CoordinateParseError("degrees out of range")
    return value


def _parse_axis(part: str) -> tuple[float, str]:
    """Parse one axis token -> (decimal_degrees, axis) with axis in {lat, lon}."""
    part = part.strip()
    m = _RE_DMS.match(part)
    if m:
        deg, minutes, seconds, hemi = m.groups()
        value = _axis_value(float(deg), float(minutes), float(seconds), hemi)
        return value, ("lat" if hemi in "NS" else "lon")
    m = _RE_DM.match(part)
    if m:
        deg, minutes, hemi = m.groups()
        # degree:decimal-minutes is converted via integer-rounded seconds
        # (evidenced by 29:52.583 N -> 29.87639 in
        # reference tests/fixtures/arc-angle-single-vx-result.json:
        # 0.583' = 34.98" -> 35" -> 29.8763888 -> 29.87639)
        minutes_f = float(minutes)
        if minutes_f >= 60:
            raise CoordinateParseError("minutes out of range")
        whole_minutes = math.floor(minutes_f)
        seconds = float(js_math_round(math.fmod(minutes_f, 1.0) * 60.0))
        if seconds == 60.0:  # numeric carry; value is identical either way
            seconds = 0.0
            whole_minutes += 1
        value = _axis_value(float(deg), float(whole_minutes), seconds, hemi)
        return value, ("lat" if hemi in "NS" else "lon")
    m = _RE_COMPACT.match(part)
    if m:
        digits, frac, hemi = m.groups()
        # lat uses DDMMSS (6 digits), lon uses DDDMMSS (7 digits)
        if hemi in "NS":
            if len(digits) != 6:
                raise CoordinateParseError("bad compact latitude")
            deg, minutes, sec = digits[0:2], digits[2:4], digits[4:6]
        else:
            if len(digits) != 7:
                raise CoordinateParseError("bad compact longitude")
            deg, minutes, sec = digits[0:3], digits[3:5], digits[5:7]
        seconds = float(sec) + (float(f"0.{frac}") if frac else 0.0)
        value = _axis_value(float(deg), float(minutes), seconds, hemi)
        return value, ("lat" if hemi in "NS" else "lon")
    m = _RE_DEC_H.match(part)
    if m:
        deg, hemi = m.groups()
        value = _axis_value(float(deg), 0.0, 0.0, hemi)
        return value, ("lat" if hemi in "NS" else "lon")
    raise CoordinateParseError(f"unparseable coordinate part {part!r}")


def parse_coordinate(text: str, precision: int = PRECISION) -> tuple[float, float]:
    """Parse a full coordinate pair string -> (longitude, latitude).

    Splitting strategy: hemisphere-letter formats are split after the
    first hemisphere letter; plain decimal pairs split on comma or
    whitespace. Raises CoordinateParseError on any failure (the caller
    wraps it into the reference's 'Unknown coordinate definition' error).
    """
    s = text.strip()
    if not s:
        raise CoordinateParseError("empty coordinate")

    m = re.match(r"^(.*?[NSEW])[\s,]+(.*?[NSEW])$", s)
    if m:
        v1, a1 = _parse_axis(m.group(1))
        v2, a2 = _parse_axis(m.group(2))
        if a1 == a2:
            raise CoordinateParseError("duplicate axis")
        lat, lon = (v1, v2) if a1 == "lat" else (v2, v1)
        return js_to_fixed(lon, precision), js_to_fixed(lat, precision)

    # plain decimal pair: "lat, lon" or "lat lon"
    parts = [p for p in re.split(r"[,\s]+", s) if p]
    if len(parts) == 2 and _RE_DEC.match(parts[0]) and _RE_DEC.match(parts[1]):
        lat, lon = float(parts[0]), float(parts[1])
        if abs(lat) > 90 or abs(lon) > 180:
            raise CoordinateParseError("degrees out of range")
        return js_to_fixed(lon, precision), js_to_fixed(lat, precision)

    raise CoordinateParseError(f"unparseable coordinate {text!r}")


def dec_to_dms(decimal: float, axis: str) -> str:
    """Decimal degrees -> 'DD:MM:SS H' with carry at 60 and zero padding
    (reference src/geojson-to-openair.ts:124-161)."""
    pos = abs(decimal)
    deg = math.floor(pos)
    deg_decimal_x60 = (pos % 1.0) * 60.0
    minutes = math.floor(deg_decimal_x60)
    sec = js_math_round((deg_decimal_x60 % 1.0) * 60.0)
    if sec == 60:
        minutes += 1
        sec = 0
    if minutes == 60:
        deg += 1
        minutes = 0
    deg_str = f"{deg:03d}" if axis == "lon" else f"{deg:02d}"
    if axis == "lon":
        suffix = "E" if decimal >= 0 else "W"
    else:
        suffix = "N" if decimal >= 0 else "S"
    return f"{deg_str}:{minutes:02d}:{sec:02d} {suffix}"
