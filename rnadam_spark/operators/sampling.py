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
    return df.filter(sample_predicate(key, fraction, seed))


def sample_predicate(key: Column | str, fraction: float, seed: int = 17) -> Column:
    """The row-local membership predicate behind :func:`hash_sample`,
    exposed as a Column so fused operators can carry membership as a
    flag instead of re-scanning a filtered copy of the same table
    (r13: dsir's one-pass histogram pair)."""
    return _sample_code(key, seed) < int(fraction * MOD)


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


def cap_per_group(
    df: DataFrame,
    group: str,
    n: int,
    key: str,
    seed: int = 23,
) -> DataFrame:
    """Keep at most ``n`` rows per group — EXACTLY the ``n`` rows whose
    universal hash of ``key`` is smallest (ties by ``key``), so the
    kept set is deterministic under any partitioning and re-derivable
    by any engine. This is the per-domain quota of web curation (cap
    how much one hot domain contributes to the corpus) with an
    audit-stable answer to "which docs survived the cap?".

    The textbook form — ``row_number() OVER (PARTITION BY group)`` —
    funnels each hot group through one task, the exact skew this
    engine's guards exist to avoid. Instead, a threshold-refinement
    plan:

    1. per-group counts (one partial-aggregating groupBy, broadcast);
    2. groups within the cap pass whole; over-cap groups keep only rows
       whose hash code falls below ``(n + 6√n + 20)/count`` of the hash
       range — the codes are uniform, so the survivor count per group
       concentrates at ``n + 6√n + 20`` (a Chernoff bound puts the
       probability of under-selecting below ~1e-9 per group);
    3. the exact rank runs only over those ~n survivors per group — the
       window partitions are bounded BY CONSTRUCTION, hot group or not;
    4. a lazy self-healing fallback: any group whose survivor count
       still came up short (theory says never; the plan doesn't rely on
       theory) is re-ranked over its full rows — an empty subtree in
       every practical run.

    The overhead vs the naive window is one broadcast join and a
    second bounded window; the win is that no task ever materializes a
    hot group."""
    assert n >= 1
    code = _sample_code(key, seed)
    coded = df.withColumn("_code", code)
    slack = int(n + 6 * (n**0.5) + 20)
    counts = coded.groupBy(group).agg(F.count("*").alias("_cnt"))
    thr = counts.withColumn(
        "_thr",
        F.when(F.col("_cnt") <= n, F.lit(MOD))
        .otherwise(
            F.least(
                F.lit(MOD),
                F.ceil(F.lit(float(MOD)) * F.lit(float(slack)) / F.col("_cnt")).cast(
                    "bigint"
                ),
            )
        ),
    )
    survivors = coded.join(F.broadcast(thr), group).filter(F.col("_code") < F.col("_thr"))
    w = Window.partitionBy(group).orderBy("_code", key)
    ranked = survivors.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= n)
    # groups whose threshold under-selected (survivors < min(n, cnt)):
    # statistically ~never, handled lazily — no driver action. LEFT
    # join from the over-cap threshold table so a (theoretical)
    # ZERO-survivor group — absent from the survivor counts entirely —
    # is still flagged (coalesce(_got, 0)), not silently dropped.
    got = survivors.groupBy(group).agg(F.count("*").alias("_got"))
    short = (
        thr.filter(F.col("_cnt") > n)
        .join(got, group, "left")
        .filter(F.coalesce(F.col("_got"), F.lit(0)) < F.least(F.lit(n), F.col("_cnt")))
        .select(group)
    )
    rescue = (
        coded.join(F.broadcast(short), group, "leftsemi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
    )
    return (
        kept.join(F.broadcast(short), group, "left_anti")
        .select(*df.columns)
        .unionByName(rescue.select(*df.columns))
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
