"""Utilities: error taxonomy, timing/profiling, progress callbacks."""

from .errors import (
    TexAbortError, TexArithmeticOverflowError, TexInvalidArgError,
    TexInvalidDataError, TexNotSupportedError,
)
from .timing import profile_trace, timed

__all__ = [
    "TexAbortError", "TexArithmeticOverflowError", "TexInvalidArgError",
    "TexInvalidDataError", "TexNotSupportedError", "profile_trace", "timed",
]
