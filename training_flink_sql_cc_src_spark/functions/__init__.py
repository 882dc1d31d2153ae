"""UDF / UDAF / UDTF surface (SURVEY.md §2.8)."""

from .udfs import (
    tokenize_udtf,
    zscore_grouped,
    char_entropy,
)

__all__ = ["tokenize_udtf", "zscore_grouped", "char_entropy"]
