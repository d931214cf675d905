"""Parser error channel.

Mirrors the reference's ParserError message formatting
(reference src/parser-error.ts:36-61): with a line number the message is
``Error found at line {n}: {msg}``; note the reference stores that
*formatted* message back into ``errorMessage``, so nested wrapping
produces doubled prefixes (visible in its own tests, e.g.
"Error found at line 14: Error found at line 14: Unknown coordinate ...").
We reproduce that faithfully.
"""

from __future__ import annotations

from typing import Optional


class ParserError(Exception):
    def __init__(
        self,
        error_message: str,
        line_number: Optional[int] = None,
        geometry=None,
        self_intersections=None,
    ):
        message = (
            error_message
            if line_number is None
            else f"Error found at line {line_number}: {error_message}"
        )
        super().__init__(message)
        self.message = message
        self.line_number = line_number
        # reference sets errorMessage to the *formatted* message (src/parser-error.ts:50-53)
        self.error_message = message
        self.geometry = geometry
        self.self_intersections = self_intersections

    def to_dict(self) -> dict:
        out = {"name": "ParserError", "errorMessage": self.error_message}
        if self.line_number is not None:
            out["lineNumber"] = self.line_number
        if self.geometry is not None:
            out["geometry"] = self.geometry
        if self.self_intersections:
            out["selfIntersections"] = self.self_intersections
        return out
