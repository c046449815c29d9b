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
# block). Fix the SUM, not the rounding: quantize each term
# DETERMINISTICALLY, then sum exactly in integers (associative, so no
# partition/engine order can change anything).
#
# Per-term quantization: q = floor(x·10⁶ + 0.5) — two IEEE ops both
# engines compute identically on equal double bits. The 6dp grain is
# not approximation for TPC-H-shaped money: sources are 2dp decimals
# and their 2-/3-factor products are 4dp/6dp decimals, while the double
# that carries them is within ~10⁻¹² of that true decimal — so the 6dp
# re-quantization RECOVERS the exact decimal value per term, and the
# integer sum equals the true exact-decimal money sum. (The previous
# form summed DECIMAL(38,10) casts of the doubles: equally exact
# cross-engine, but the per-row BigDecimal cast plus wide-decimal
# accumulator benched ~5× slower than long sums at sf0.1 and needed
# probed engine pairings for three different decimal cast/round ops.)
#
# Unbounded scale without long overflow: a single scaled-long
# accumulator caps at ~9·10¹⁸/10¹¹ ≈ 10⁸ max-magnitude rows per group —
# too low for 100 TB. So each q splits into hi = floor(x) (≈ the value,
# ≤10⁵ per term) and lo = q − hi·10⁶ (≤~10⁶ per term), each summed as a
# plain codegen'd long (ceilings ~10¹³ rows per group), and the two
# sums recombine EXACTLY into one DECIMAL(38,0) per GROUP — per-group,
# not per-row, so the decimal cost is O(groups). The split convention
# cannot leak cross-engine: hi·10⁶ + lo == q by construction, so the
# recombined total is Σq no matter how either engine rounds hi.
#
# Rounding to d output places happens in exact integer arithmetic on
# the recombined decimal (half-up via pmod — Spark's pmod and DuckDB's
# ((x % m) + m) % m are the probed-identical pair), and only the ONE
# final scale-0 decimal converts to double (a single correctly-rounded
# conversion in both engines — the old decimal(38,10)→double pair
# diverged because DuckDB converted then divided, two roundings),
# followed by a single division. Pinned in tests/test_approx.py.

MONEY_SCALE = 1_000_000  # 6dp per-term grain (see above)


def _money_split(c: Column) -> tuple[Column, Column]:
    q = F.floor(c * F.lit(float(MONEY_SCALE)) + F.lit(0.5))
    hi = F.floor(c)
    return hi, q - hi * F.lit(MONEY_SCALE)


def money_sum_exact(col: Column | str) -> Column:
    """Exact DECIMAL(38,0) of Σ round₆(term)·10⁶ — the engine- and
    order-independent integer the double-facing forms derive from."""
    c = F.col(col) if isinstance(col, str) else col
    hi, lo = _money_split(c)
    return F.sum(hi).cast("decimal(38,0)") * F.lit(MONEY_SCALE) + F.sum(lo).cast(
        "decimal(38,0)"
    )


def money_sum_exact_sql(expr: str) -> str:
    hi = f"CAST(floor({expr}) AS BIGINT)"
    q = f"CAST(floor(({expr}) * {MONEY_SCALE}.0 + 0.5) AS BIGINT)"
    lo = f"({q} - {hi} * {MONEY_SCALE})"
    return (
        f"(CAST(sum({hi}) AS DECIMAL(38,0)) * {MONEY_SCALE}"
        f" + CAST(sum({lo}) AS DECIMAL(38,0)))"
    )


def money_sum(col: Column | str) -> Column:
    return money_sum_exact(col).cast("double") / F.lit(float(MONEY_SCALE))


def money_sum_sql(expr: str) -> str:
    return f"(CAST({money_sum_exact_sql(expr)} AS DOUBLE) / {MONEY_SCALE}.0)"


def money_sum_rounded(col: Column | str, d: int = 4) -> Column:
    """Half-up d-place rounding of the exact sum, done in exact integer
    arithmetic BEFORE the one decimal→double conversion."""
    assert 0 <= d <= 6, "per-term grain is 6dp; cannot round finer"
    step = MONEY_SCALE // 10**d
    half = step // 2
    s = money_sum_exact(col) + F.lit(half)
    r = s - F.pmod(s, F.lit(step))
    return r.cast("double") / F.lit(float(MONEY_SCALE))


def money_sum_rounded_sql(expr: str, d: int = 4) -> str:
    assert 0 <= d <= 6, "per-term grain is 6dp; cannot round finer"
    step = MONEY_SCALE // 10**d
    half = step // 2
    s = f"({money_sum_exact_sql(expr)} + {half})"
    r = f"({s} - ((({s} % {step}) + {step}) % {step}))"
    return f"(CAST({r} AS DOUBLE) / {MONEY_SCALE}.0)"
