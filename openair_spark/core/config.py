"""Parser configuration defaults.

Mirrors reference src/default-config-factory.ts:28-141 (v1/v2 allowed
classes & types, unlimited=999, geometryDetail=100, targetAltUnit=FT,
validateGeometry=True, fixGeometry=False, outputGeometry=POLYGON).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

VERSION_1 = "1.0"
VERSION_2 = "2.0"

V1_ALLOWED_CLASSES = [
    "A", "B", "C", "D", "E", "F", "G",
    "AWY", "CTR", "GSEC", "MTMA", "GP", "P", "Q", "R", "RMZ", "TRA", "TMZ",
]

V2_ALLOWED_CLASSES = ["A", "B", "C", "D", "E", "F", "G", "UNC"]

V2_ALLOWED_TYPES = [
    "ACCSEC", "ADIZ", "ALERT", "ASRA", "ATZ", "AWY", "CTA", "CTR", "CUSTOM",
    "FIR", "FIS", "GSEC", "HTZ", "LTA", "MATZ", "MTA", "MTR", "N", "NONE",
    "OFR", "P", "Q", "R", "RMZ", "TFR", "TIA", "TIZ", "TMA", "TMZ", "TRA",
    "TRAFR", "TRZ", "TSA", "UIR", "UTA", "VFRR", "VFRSEC", "WARNING",
]

POLYGON = "POLYGON"
LINESTRING = "LINESTRING"


@dataclass
class ParserConfig:
    version: str = VERSION_2
    allowed_classes: list = field(default_factory=list)
    allowed_types: list = field(default_factory=list)
    unlimited: int = 999
    geometry_detail: int = 100
    consume_duplicate_buffer: float = 0.0
    validate_geometry: bool = True
    fix_geometry: bool = False
    warn_if_expired: bool = False
    output_geometry: str = POLYGON
    target_alt_unit: Optional[str] = "FT"  # reference default targetAltUnit: FEET
    round_alt_values: bool = False
    include_openair: bool = False

    @staticmethod
    def default(version: str = VERSION_2, **overrides) -> "ParserConfig":
        """defaultConfigFactory + user-override merge (src/parser.ts:91-98)."""
        cfg = ParserConfig(version=version)
        if version == VERSION_1:
            cfg.allowed_classes = list(V1_ALLOWED_CLASSES)
            cfg.allowed_types = []
        else:
            cfg.allowed_classes = list(V2_ALLOWED_CLASSES)
            cfg.allowed_types = list(V2_ALLOWED_TYPES)
        for key, value in overrides.items():
            if not hasattr(cfg, key):
                raise TypeError(f"unknown config key {key!r}")
            setattr(cfg, key, value)
        if cfg.target_alt_unit is not None:
            cfg.target_alt_unit = cfg.target_alt_unit.upper()
        return cfg
