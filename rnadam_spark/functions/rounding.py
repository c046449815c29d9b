"""Portable half-up rounding for oracle-compared float aggregates.

Spark's ``round()`` is decimal HALF_UP; DuckDB's is banker's rounding —
they disagree whenever a value lands exactly on a half boundary (e.g.
x.xxx25 rounded to 4 places). ``floor(x * 10^d + 0.5) / 10^d`` is pure
IEEE-double arithmetic, so two engines given bitwise-equal inputs
produce bitwise-equal outputs. Every query that rounds for the
correctness gate uses this form on BOTH sides (the oracle SQL spells it
out literally).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(col: Column | str, d: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**d)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def hround_sql(expr: str, d: int) -> str:
    scale = 10**d
    return f"floor(({expr}) * {scale}.0 + 0.5) / {scale}.0"
