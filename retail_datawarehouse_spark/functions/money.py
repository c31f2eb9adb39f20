"""Exact-arithmetic helpers for oracle-parity aggregates.

The correctness gate hash-compares Spark results against DuckDB
(SURVEY.md §5). A double SUM is order-dependent, and Spark and DuckDB
accumulate in different orders, so two "correct" engines disagree in the
low bits — enough to flip a rounded cent at warehouse magnitudes.

Convention: monetary inputs in the test data are 2-decimal values, so
``CAST(x AS DECIMAL(18,4))`` is *exact* (no rounding happens → both
engines represent the identical value), decimal SUM/multiplication are
exact integer arithmetic in both engines, and the final
``CAST(... AS DOUBLE)`` of an exact decimal is deterministic. Result:
bit-identical doubles from both engines, any hash function matches.

This mirrors the SURVEY.md §7 risk-4 decision: Double at the surface for
oracle parity, decimal internally where exactness is needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DEC = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Exact decimal image of a 2-decimal monetary double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY_DEC)


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """SUM as exact decimal, surfaced as double (bit-identical to DuckDB's
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``)."""
    out = F.sum(dec(col)).cast("double")
    return out.alias(alias) if alias else out
