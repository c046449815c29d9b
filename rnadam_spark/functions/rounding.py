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


# Order-independent money sums. A double SUM is order-dependent (~1e-10
# relative drift over millions of rows), so fixed-decimal rounding of an
# unbounded sum has a data-volume ceiling: at ~3×10¹¹ magnitudes, 4dp
# demands 15 significant digits of agreement and the half-up boundary
# flips in the last place (observed at 6M lineitem rows, SURVEY sf1
# block). Fix the SUM, not the rounding: cast each double term to
# DECIMAL(38,10) per row — a deterministic function of the double's
# bits that Spark and DuckDB compute identically (pinned row-for-row in
# tests/test_approx.py) — then sum EXACTLY in decimal (associative, so
# no partition/engine order can change the result), then cast the one
# identical decimal back to double for the usual hround. Exact at every
# scale a DECIMAL(38,10) accumulator can hold (10²⁷ absolute), with no
# floor(log10) boundary mode the significant-digit form would add.

MONEY_DECIMAL = "DECIMAL(38,10)"


def money_sum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY_DECIMAL)).cast("double")


def money_sum_sql(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS {MONEY_DECIMAL})) AS DOUBLE)"


# When the ROUNDED SUM is itself the output column, the rounding must
# also happen in decimal. At ~5×10¹¹ sums (60M lineitem rows) a second
# failure mode appeared past the summation-order one: the exact decimal
# sums AGREE, but each engine's decimal(38,10)→double conversion rounds
# differently (DuckDB converts the hugeint then divides — two IEEE
# roundings; Java's BigDecimal.doubleValue rounds once, correctly), so
# the 4dp hround over doubles flips its floor by one ulp. Rounding to
# d places in exact decimal first removes the conversion from the
# rounding path entirely; the remaining decimal(38,d)→double cast is
# correctly rounded in BOTH engines while the unscaled value fits 2⁵³
# (|sum| ≲ 9×10¹¹ at d=4). Past that, the DOUBLE TYPE itself cannot
# express a 4dp grain (ulp(10¹²) > 10⁻⁴) — the remedy there is a
# decimal output column, not cleverer rounding.
#
# Engine pairing (probed, ties included, pinned in tests/test_approx.py):
# Spark's decimal downcast CAST rounds HALF_UP (= half away from zero);
# DuckDB's CAST truncates but its round() is half away from zero — so
# the pair is Spark-CAST ↔ DuckDB-round().


def money_sum_rounded(col: Column | str, d: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY_DECIMAL)).cast(f"decimal(38,{d})").cast("double")


def money_sum_rounded_sql(expr: str, d: int = 4) -> str:
    return f"CAST(round(sum(CAST(({expr}) AS {MONEY_DECIMAL})), {d}) AS DOUBLE)"
