"""Exact (integer-scaled) arithmetic helpers.

All money-like columns in the fixtures carry exactly 2 decimal digits.
Summing them as doubles gives non-deterministic low-order bits across
engines/partition orders; summing exact integer cents is associative and
bit-identical everywhere, and the single final division back to double
is deterministic. This is how the engine keeps aggregate results
hash-identical to the DuckDB oracle while staying wholly JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 2) -> Column:
    """Scale a k-decimal double into an exact integer (default cents)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("bigint")


def sql_cents(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`cents`."""
    return f"CAST(round(({expr}) * {10 ** scale}) AS BIGINT)"
