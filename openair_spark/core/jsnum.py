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


def _to_fixed_decimal(x: float, digits: int) -> float:
    """Exact ECMA toFixed via Decimal — the reference semantics, used
    directly only for magnitudes whose scaled fraction sits within
    1e-6 of a half-tie (where double arithmetic cannot decide)."""
    sign = -1.0 if (x < 0 or (x == 0 and math.copysign(1.0, x) < 0)) else 1.0
    # Decimal(float) is the exact binary expansion — matches the spec's
    # "n / 10^f - x as close to zero as possible, ties pick larger n".
    q = Decimal(abs(x)).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP)
    return sign * float(q)


def js_to_fixed(x: float, digits: int) -> float:
    """``parseFloat(x.toFixed(digits))`` — used for the reference's
    6-decimal computed-coordinate rounding (reference src/airspace.ts:82-84)
    and the coordinate parser's 5-decimal precision.

    Numeric fast path (the parse kernel calls this per coordinate): for
    |x| <= ~1e9 the scaled product abs(x) * 10^digits carries absolute
    error < ~3 ulp ~ 1e-7, so whenever its fraction is farther than
    1e-6 from 0.5 the half-up decision is provably the same as the
    exact-decimal one and the double division n / 10^digits is the
    correctly-rounded float of the quantized decimal. Only provable
    near-ties (and big magnitudes) fall back to Decimal — the previous
    repr()+Decimal path was ~18% of whole-corpus parse time."""
    if x != x or math.isinf(x):  # NaN/Inf pass through like JS would stringify
        return x
    a = abs(x)
    scale = 10.0 ** digits
    y = a * scale
    if y > 1e9:  # product ulp approaches the 1e-6 tie margin beyond this
        return _to_fixed_decimal(x, digits)
    n = math.floor(y)
    frac = y - n
    if abs(frac - 0.5) <= 1e-6:
        return _to_fixed_decimal(x, digits)
    if frac > 0.5:
        n += 1
    return math.copysign(n / scale, x)


def js_to_fixed_array(arr, digits: int):
    """Vectorized js_to_fixed over a float ndarray (same fast/fallback
    split; near-tie entries route through the exact Decimal path
    element-wise). Returns a new float64 ndarray."""
    import numpy as np

    a = np.abs(np.asarray(arr, dtype=np.float64))
    scale = 10.0 ** digits
    y = a * scale
    n = np.floor(y)
    frac = y - n
    out = np.copysign((n + (frac > 0.5)) / scale, arr)
    hard = (np.abs(frac - 0.5) <= 1e-6) | (y > 1e9) | ~np.isfinite(a)
    if bool(hard.any()):
        flat = out.ravel()
        src = np.asarray(arr, dtype=np.float64).ravel()
        for i in np.flatnonzero(hard.ravel()):
            flat[i] = js_to_fixed(float(src[i]), digits)
    return out


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
