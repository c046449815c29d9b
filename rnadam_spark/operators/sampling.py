"""Deterministic sampling and per-group quantile filtering.

Training-data curation needs REPRODUCIBLE subsets: ``df.sample()`` draws
from a seeded RNG whose stream depends on partitioning, so the same
call on a repartitioned table selects different rows — useless for
audits ("which docs were in the 1% eval holdout?") and for incremental
re-runs. The operators here decide membership per row from a universal
hash of a stable key: same row → same verdict on any cluster layout,
any partitioning, either engine (the affine-mod arithmetic reproduces
bit-for-bit in the DuckDB oracle, like functions/hashing.py).

Scale notes: hash sampling is a pure projection filter — pushdown-
friendly, zero shuffle, and composable with partition pruning. The
quantile filter's exact form ranks inside a window partitioned by the
group (one task per group — fine for bounded group counts); the approx
variant replaces the window with a groupBy percentile_approx + a
broadcast threshold join, so a single hot group partial-aggregates
map-side instead of funneling through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rnadam_spark.functions.hashing import MOD, hash_family


def _sample_code(key: Column | str, seed: int) -> Column:
    """Universal-hash code in [0, MOD) of a BIGINT key.

    The inner reduction is pmod, not %: both Spark's and DuckDB's %
    preserve the dividend's sign, so a negative key (xxhash64-minted
    doc ids are negative half the time) would yield a negative code —
    which lands below every sampling threshold (always kept), below
    every split boundary (all-train), and produces u ≤ 0 in the DSIR
    Gumbel key (NaN). pmod keeps the code in [0, MOD) for all BIGINTs;
    non-negative keys (the driver tables) hash identically either way."""
    a, b = hash_family(1, seed)[0]
    c = F.col(key) if isinstance(key, str) else key
    pm = (c.cast("bigint") % MOD + MOD) % MOD
    return (pm * a + b) % MOD


def sample_code_sql(key_expr: str, seed: int) -> str:
    """The exact same arithmetic as portable SQL (oracle side)."""
    a, b = hash_family(1, seed)[0]
    return f"((CAST({key_expr} AS BIGINT) % {MOD} + {MOD}) % {MOD} * {a} + {b}) % {MOD}"


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, seed: int = 17
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes below
    ``fraction`` of the hash range. Membership depends only on (key,
    seed) — re-runs, re-partitions, and other engines agree row-for-row.
    Disjoint seeds give independent samples (train/eval splits)."""
    return df.filter(_sample_code(key, seed) < int(fraction * MOD))


def stratified_hash_sample(
    df: DataFrame,
    strata: Column | str,
    fractions: dict[str, float],
    key: Column | str,
    default_fraction: float = 0.0,
    seed: int = 17,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample crawl data,
    keep all curated text): each stratum value gets its own keep-rate;
    unlisted strata get ``default_fraction``. One pass, no shuffle —
    the threshold is a CASE over the stratum column."""
    s = F.col(strata) if isinstance(strata, str) else strata
    threshold = F.lit(int(default_fraction * MOD))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(s == value, int(frac * MOD)).otherwise(threshold)
    return df.filter(_sample_code(key, seed) < threshold)


def top_fraction_per_group(
    df: DataFrame,
    group: str,
    score: str,
    fraction: float,
    tie_break: str,
) -> DataFrame:
    """Keep the best ``fraction`` of rows per group by ``score`` —
    the per-source quality cut of a curation pipeline. Exact: ranks
    with percent_rank over (score DESC, tie_break) — the unique
    tie-break makes the kept set deterministic and oracle-comparable.
    One window per group; a pathologically hot group funnels one task —
    use :func:`top_fraction_per_group_approx` when groups are skewed."""
    w = Window.partitionBy(group).orderBy(F.col(score).desc(), F.col(tie_break))
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= fraction)
        .drop("_pr")
    )


def _top_fraction_by_threshold(
    df: DataFrame, group: str, score: str, threshold: Column
) -> DataFrame:
    """Shared skew-safe plan shape: per-group score threshold as a
    partial-aggregating groupBy (a hot group contributes one aggregate
    buffer per partition, never one task — no per-group window
    anywhere), broadcast back onto the scan and filtered. Boundary ties
    all survive (no tie-break)."""
    thresholds = df.groupBy(group).agg(threshold.alias("_thr"))
    return (
        df.join(F.broadcast(thresholds), group)
        .filter(F.col(score) >= F.col("_thr"))
        .drop("_thr")
    )


def top_fraction_per_group_approx(
    df: DataFrame,
    group: str,
    score: str,
    fraction: float,
    accuracy: int = 10_000,
) -> DataFrame:
    """Skew-safe quantile filter, sketch threshold: ``percentile_approx``
    buffers a fixed-size KLL-style sketch per (partition, group) —
    memory O(accuracy) regardless of group size. Keeps ~``fraction``
    per group within sketch accuracy. The 100 TB default."""
    return _top_fraction_by_threshold(
        df, group, score, F.percentile_approx(score, 1.0 - fraction, accuracy)
    )


def top_fraction_per_group_threshold(
    df: DataFrame, group: str, score: str, fraction: float
) -> DataFrame:
    """Skew-safe quantile filter, exact threshold: same broadcast-
    threshold plan as the approx variant but with the exact interpolated
    ``percentile`` aggregate — still no per-group window (the aggregate
    partial-merges a value→count map per partition; memory ∝ distinct
    scores, which rounded quality scores bound). Exact and
    engine-portable (DuckDB's ``quantile_cont`` computes the same
    position p·(n−1) interpolation), so this is the hash-verified form;
    swap the one aggregate expression for ``percentile_approx`` when
    scores are high-cardinality continuous."""
    return _top_fraction_by_threshold(
        df, group, score, F.expr(f"percentile({score}, {1.0 - fraction})")
    )
