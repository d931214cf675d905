"""JavaScript-compatible number semantics.

The reference engine runs on V8 doubles; output fixtures encode numbers
through JS ``toFixed`` / ``Math.round`` / shortest-round-trip printing.
These helpers reproduce those exact behaviors on Python floats so our
results hash-match the reference fixtures bit-for-bit.

Reference behaviors absorbed:
  - ``Number.prototype.toFixed`` (ECMA-262): decimal expansion of the
    exact binary double, ties pick the larger magnitude (half-up on the
    absolute value; sign handled separately).
  - ``Math.round``: floor(x + 0.5) — ties toward +Infinity.
  - JSON number printing: shortest round-trip, integral doubles print
    without a trailing ``.0`` (``2200`` not ``2200.0``).
"""

from __future__ import annotations

import json
import math
from decimal import ROUND_HALF_UP, Decimal


def js_to_fixed(x: float, digits: int) -> float:
    """``parseFloat(x.toFixed(digits))`` — used for the reference's
    6-decimal computed-coordinate rounding (reference src/airspace.ts:82-84)
    and the coordinate parser's 5-decimal precision."""
    if x != x or math.isinf(x):  # NaN/Inf pass through like JS would stringify
        return x
    # fast path: if the shortest round-trip repr already has <= digits
    # decimals, toFixed is the identity (the exact binary expansion sits
    # within ~1e-15 of that decimal, far from any 10^-digits tie)
    s = repr(x)
    if "e" not in s and "E" not in s:
        dot = s.find(".")
        if dot == -1 or len(s) - dot - 1 <= digits:
            return x
    sign = -1.0 if (x < 0 or (x == 0 and math.copysign(1.0, x) < 0)) else 1.0
    # Decimal(float) is the exact binary expansion — matches the spec's
    # "n / 10^f - x as close to zero as possible, ties pick larger n".
    q = Decimal(abs(x)).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP)
    return sign * float(q)


def js_math_round(x: float) -> int:
    """JS ``Math.round``: half-ties toward +Infinity (Math.round(-1.5) == -1)."""
    return int(math.floor(x + 0.5))


def _js_num(x: float):
    """Render a float the way JSON.stringify would: integral doubles as ints."""
    if isinstance(x, float) and x.is_integer() and abs(x) < 2**53:
        return int(x)
    return x


def jsify_numbers(obj):
    """Recursively convert integral floats to ints (JS JSON number style)."""
    if isinstance(obj, float):
        return _js_num(obj)
    if isinstance(obj, list):
        return [jsify_numbers(v) for v in obj]
    if isinstance(obj, tuple):
        return [jsify_numbers(v) for v in obj]
    if isinstance(obj, dict):
        return {k: jsify_numbers(v) for k, v in obj.items()}
    return obj


def js_json_dumps(obj) -> str:
    """JSON.stringify-compatible serialization (shortest float repr,
    integral doubles without '.0', no whitespace)."""
    return json.dumps(jsify_numbers(obj), separators=(",", ":"), ensure_ascii=False)
