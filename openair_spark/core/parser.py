"""End-to-end OpenAIR text parser (pure function).

reference src/parser.ts:100-192, re-expressed as
``parse_text(text, config) -> ParseResult`` so it can run per-document
inside Arrow-batched Spark UDFs (no filesystem access, no state).

The block-segmentation FSM (:129-159) is reproduced here for the
per-document kernel; the Spark layer expresses the same segmentation
as a running-sum window over the token stream (openair_spark.spark).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional

from . import tokenizer as tk
from .airspace import as_geojson
from .config import VERSION_2, ParserConfig
from .errors import ParserError
from .factory import create_airspace


@dataclass
class ParseResult:
    success: bool
    geojson: Optional[dict] = None
    error: Optional[ParserError] = None
    warnings: list = field(default_factory=list)

    @property
    def error_message(self) -> Optional[str]:
        return self.error.message if self.error else None


def segment_blocks(tokens: list) -> list[list]:
    """START/READ FSM: ignored tokens never enter blocks, AC in READ
    state flushes, EOF flushes the trailing block (src/parser.ts:129-159)."""
    blocks: list[list] = []
    current: list = []
    state = "start"
    for token in tokens:
        if token.ignored:
            continue
        if token.type == tk.AC and state == "read" and current:
            blocks.append(current)
            current = []
        if token.type == tk.EOF:
            if state == "read" and current:
                blocks.append(current)
                current = []
                continue
        state = "read"
        current.append(token)
    return blocks


def parse_text(text: str, config: Optional[ParserConfig] = None,
               id_seed: str = "", now: Optional[datetime] = None) -> ParseResult:
    """Parse one OpenAIR document. Fail-fast: the first error anywhere in
    the document aborts the whole document (the reference's file
    granularity becomes per-url granularity in the Spark pipeline)."""
    if config is None:
        config = ParserConfig.default()
    warnings: list = []
    try:
        tokens = tk.tokenize(text, config, warnings, now)
        airspaces = []
        for block in segment_blocks(tokens):
            airspace = create_airspace(block, config)
            if airspace is not None:
                airspaces.append(airspace)
        features = [
            as_geojson(a, config, id_seed=f"{id_seed}|{i}")
            for i, a in enumerate(airspaces)
        ]
        return ParseResult(
            success=True,
            geojson={"type": "FeatureCollection", "features": features},
            warnings=warnings,
        )
    except ParserError as err:
        return ParseResult(success=False, error=err, warnings=warnings)
