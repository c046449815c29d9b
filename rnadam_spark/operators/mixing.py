"""Data mixing: token-budget-aware corpus composition across sources.

The step between curation and packing: a training run specifies a
TARGET MIXTURE ("30% web, 30% code, 20% books, 20% reference" of a
T-token budget — the Pile/DoReMi recipe shape), and the engine must
realize it from whatever each source actually holds. Generalizes
``sampling.stratified_hash_sample`` from given per-stratum keep-rates
to rates DERIVED from token accounting, including >1× rates
(upsampling a scarce source by repeating documents — standard practice
when a high-value source is smaller than its mixture share).

Sibling of ``lm.sample_to_mixture``, which covers the other half of
the mixing space: there the shares are DERIVED (temperature-scaled
``token_share**alpha``) and rates cap at 1 (reshape-by-shedding);
here the shares are EXPLICIT recipe fractions and rates above 1
replicate. Use that one to soften natural proportions, this one to
hit a stated recipe.

Scale shape — broadcast + projection, no window, no global sort:

1. one groupBy(source) aggregates available tokens (map-side partials;
   bounded by source count);
2. rates = (share_s × budget) / available_s compute driver-side on that
   bounded table and broadcast back as a CASE projection;
3. selection is deterministic hash-Bernoulli per document
   (``sampling._sample_code`` — reproducible on any partitioning and
   bit-identical in the DuckDB oracle): a rate of 2.3 emits 2 full
   copies (``n_copy`` 0 and 1) plus a 0.3-probability third via one
   in-row ``sequence`` + ``explode`` — no driver loop, no shuffle.

Realized tokens per source are Binomial around the target (relative
error ~1/√docs·share — negligible at corpus scale); exactness to the
last token is the packer's job (``lm.pack_sequences``), not the
sampler's. Replicated copies carry ``n_copy`` so downstream exact
dedup keys on (doc_id, n_copy) and epoch-aware loaders can tell
repeats apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.hashing import MOD
from rnadam_spark.operators.sampling import _sample_code


def source_token_budgets(
    docs: DataFrame,
    shares: dict[str, float],
    token_budget: int,
    token_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """(source, share, available_tokens, target_tokens, rate): the
    mixing plan — one bounded row per source. ``rate`` is
    target/available (>1 means upsampling); sources absent from
    ``shares`` get rate 0 and are dropped by :func:`mixture_sample`.
    Shares need not sum to 1 (they are absolute fractions of
    ``token_budget``)."""
    share_expr = F.lit(0.0)
    for value, share in sorted(shares.items()):
        share_expr = F.when(F.col(source_col) == value, F.lit(float(share))).otherwise(
            share_expr
        )
    return (
        docs.groupBy(source_col)
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("available_tokens"))
        .select(
            F.col(source_col).alias("source"),
            share_expr.alias("share"),
            "available_tokens",
            (share_expr * F.lit(float(token_budget))).alias("target_tokens"),
        )
        .withColumn(
            "rate",
            F.when(
                F.col("available_tokens") > 0,
                F.col("target_tokens") / F.col("available_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def mixture_sample(
    docs: DataFrame,
    shares: dict[str, float],
    token_budget: int,
    token_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 41,
) -> DataFrame:
    """Documents realizing the target mixture: all input columns plus
    ``n_copy`` (0-based repeat index; >0 rows are upsampled repeats).
    Deterministic in (doc id, repeat index, seed) — re-runs and
    re-partitions select identical rows, and the arithmetic reproduces
    in the DuckDB oracle.

    Per document with source rate r: ``floor(r)`` guaranteed copies,
    plus one more iff hash(id, seed) < frac(r)·MOD — exactly one
    fractional draw per document (the guaranteed copies are not
    draws), so realized tokens per source are Binomial(docs, frac(r))
    around the target. One projection + in-row explode; rate literals
    ride a CASE (source count is dimension-sized), so nothing
    shuffles."""
    rates = {
        r["source"]: r["rate"]
        for r in source_token_budgets(
            docs, shares, token_budget, token_col, source_col
        ).collect()
    }
    # rate as a CASE projection (bounded dimension, like stratified_hash_sample)
    rate_expr = F.lit(0.0)
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(source_col) == value, F.lit(rate)).otherwise(rate_expr)
    whole = F.floor(rate_expr).cast("int")
    frac = rate_expr - whole.cast("double")
    extra = _sample_code(F.col(id_col), seed) < (frac * F.lit(float(MOD))).cast("bigint")
    n_copies = whole + F.when(extra, 1).otherwise(0)
    return (
        docs.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("n_copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )
