"""GeoJSON FeatureCollection -> OpenAIR text (reference
src/geojson-to-openair.ts:22-161).

Emission order per feature: version header comment, blank, AC, [AY],
AN upper-cased, [AF], [AG], [AX], [AA*], AL, AH, DP per ring position
(decimal -> DMS with carry), trailing blank.
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional

from .config import VERSION_2
from .coordinates import dec_to_dms
from .jsnum import jsify_numbers


def _to_alt_limit(ceiling: dict) -> str:
    value = jsify_numbers(ceiling["value"])
    unit = ceiling["unit"]
    datum = ceiling["referenceDatum"]
    if unit == "FL":
        return f"FL{value}"
    if datum == "GND" and value == 0:
        return "GND"
    if datum == "MSL":
        return f"{value}{unit} AMSL"
    if datum == "GND":
        return f"{value}{unit} AGL"
    return f"{value}{unit} {datum}"


def _to_activation_time(activation: dict) -> str:
    parts = []
    for key in ("start", "end"):
        value = activation.get(key)
        parts.append("NONE" if value is None else value)
    return "/".join(parts)


def _to_coordinate(position) -> str:
    lon = dec_to_dms(position[0], "lon")
    lat = dec_to_dms(position[1], "lat")
    return f"{lat} {lon}"


def geojson_to_openair(feature_collection: dict, version: str,
                       year: Optional[int] = None) -> list[str]:
    if year is None:
        year = datetime.now().year  # reference uses new Date().getFullYear()
    out: list[str] = []
    for feature in feature_collection["features"]:
        props = feature["properties"]
        geometry = feature["geometry"]
        coordinates = (
            geometry["coordinates"][0]
            if geometry["type"] == "Polygon"
            else geometry["coordinates"]
        )
        header_version = "2.0" if version == VERSION_2 else "1.0"
        out.append(
            f"* Version {header_version}, Copyright © {year}, Naviter d.o.o. All Rights Reserved"
        )
        out.append("")
        out.append(f"AC {props['class']}")
        if version == VERSION_2 and props.get("type") is not None:
            out.append(f"AY {props['type']}")
        out.append(f"AN {props['name'].upper()}")
        frequency = props.get("frequency") or {}
        if version == VERSION_2 and frequency.get("value") is not None:
            out.append(f"AF {frequency['value']}")
        if version == VERSION_2 and frequency.get("name") is not None:
            out.append(f"AG {frequency['name']}")
        if version == VERSION_2 and props.get("transponderCode") is not None:
            out.append(f"AX {props['transponderCode']}")
        if version == VERSION_2 and props.get("activationTimes"):
            for activation in props["activationTimes"]:
                out.append(f"AA {_to_activation_time(activation)}")
        out.append(f"AL {_to_alt_limit(props['lowerCeiling'])}")
        out.append(f"AH {_to_alt_limit(props['upperCeiling'])}")
        for coord in coordinates:
            out.append(f"DP {_to_coordinate(coord)}")
        out.append("")
    return out
