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
        cfg.validate()
        return cfg

    def validate(self) -> None:
        """Value-level config validation (Zod-schema mirror).

        Parser schema: reference src/parser.ts:58-76 (unlimited int>=1,
        geometryDetail int>=1, consumeDuplicateBuffer>=0, enums).
        Factory schema additionally requires geometryDetail >= 50
        (src/airspace-factory.ts:44-51) and is constructed on every
        parse, so <50 always fails — enforced here, at the same
        config-resolution boundary."""
        if self.version not in (VERSION_1, VERSION_2):
            raise TypeError(f"invalid config value version={self.version!r}")
        if not isinstance(self.unlimited, int) or self.unlimited < 1:
            raise TypeError(f"invalid config value unlimited={self.unlimited!r}")
        if not isinstance(self.geometry_detail, int) or self.geometry_detail < 50:
            raise TypeError(
                f"invalid config value geometry_detail={self.geometry_detail!r} (min 50)")
        if not (isinstance(self.consume_duplicate_buffer, (int, float))
                and self.consume_duplicate_buffer >= 0):
            raise TypeError(
                "invalid config value consume_duplicate_buffer="
                f"{self.consume_duplicate_buffer!r} (min 0)")
        if self.output_geometry not in (POLYGON, LINESTRING):
            raise TypeError(
                f"invalid config value output_geometry={self.output_geometry!r}")
        if self.target_alt_unit is not None and self.target_alt_unit not in ("FT", "M", "FL"):
            raise TypeError(
                f"invalid config value target_alt_unit={self.target_alt_unit!r}")
        for name in ("allowed_classes", "allowed_types"):
            vals = getattr(self, name)
            if not isinstance(vals, list) or any(
                    not isinstance(v, str) or not v for v in vals):
                raise TypeError(f"invalid config value {name}={vals!r}")
        for name in ("validate_geometry", "fix_geometry", "warn_if_expired",
                     "round_alt_values", "include_openair"):
            val = getattr(self, name)
            if not isinstance(val, bool):
                raise TypeError(f"invalid config value {name}={val!r}")
