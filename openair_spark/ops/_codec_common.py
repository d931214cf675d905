"""Shared error-contract helper for the from-scratch codecs.

Every decoder promises ValueError (corrupt input) or
NotImplementedError (genuinely unsupported feature). Truncated or
bit-flipped inputs can surface as struct.error / IndexError /
OverflowError deep inside a parser; `clean_errors` converts those to
ValueError at the decoder boundary so hostile bytes can never crash a
Spark kernel with an undocumented exception type (guarded by
tests/test_codec_fuzz.py)."""

from __future__ import annotations

import functools
import struct


def clean_errors(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (ValueError, NotImplementedError):
            raise
        except (struct.error, IndexError, OverflowError, MemoryError) as exc:
            raise ValueError(
                f"corrupt {fn.__name__} input: {type(exc).__name__}: {exc}"
            ) from exc
    return wrapper
