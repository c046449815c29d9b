"""Tare — GC/k-mer bias and transcript-length bias calibration.

Re-expresses the reference's ``Tare`` (rice-core/.../algorithms/
Tare.scala). The dinucleotide featurization (Tare.scala:88-101) is pure
higher-order column expressions — no UDF, no explode, no shuffle; the
regression of log-count on context fractions uses ``pyspark.ml``'s
deterministic LinearRegression solver instead of 2015's
LinearRegressionWithSGD (Tare.scala:121) — reference tests assert
directional properties, not weights, so the better-converging solver is
drop-in (SURVEY.md §7 risk register). The length-bias OLS
(Tare.scala:164-177, driver-side jblas normal equations) becomes
closed-form ``covar_pop/var_pop`` aggregates — fully distributed.

Formula quirks preserved exactly (pinned by TareSuite goldens):
- P6 k-mer recalibration: count' = ⌊exp(mean + (label − prediction))⌋
  with mean = log(Σ multiplicity / n rows)        (Tare.scala:125-130)
- P7 length recalibration evaluates the fitted line at µ itself — NOT
  at log(length) — and subtracts µ:
  µ' = exp(mean + ((slope·µ + intercept) − µ))    (Tare.scala:187)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.shingles import char_shingles

N_CONTEXTS = 16


def _dinuc_idx(ctx: Column) -> Column:
    """A→0 C→1 G→2 T→3 (case-insensitive, Tare.scala:38-43); index =
    4·idx(c₀) + idx(c₁) (Tare.scala:62-64), computed via translate."""
    digits = F.translate(F.upper(ctx), "ACGT", "0123")
    return (
        F.substring(digits, 1, 1).cast("int") * 4 + F.substring(digits, 2, 1).cast("int")
    )


def valid_contexts(kmer: Column | str) -> Column:
    """2-shingles filtered to the ACGT alphabet (P3, Tare.scala:88-91)."""
    c = F.col(kmer) if isinstance(kmer, str) else kmer
    return F.filter(char_shingles(c, 2), lambda x: x.rlike("^[ACGTacgt]{2}$"))


def featurize_kmers(kmer_counts: DataFrame) -> DataFrame:
    """P5 (Tare.scala:88-101): 16-bin fractional dinucleotide-context
    histogram + label = log(multiplicity).

    Adds ``label DOUBLE`` and ``features ARRAY<DOUBLE>`` (length 16).
    K-mers with no valid context raise, matching the reference's
    assert (Tare.scala:91; TareSuite.scala:36-46).
    """
    ctxs = valid_contexts("kmer")
    idxs = F.transform(ctxs, _dinuc_idx)
    n = F.size(idxs)
    checked = F.when(
        n > 0, idxs
    ).otherwise(
        F.raise_error(F.concat(F.lit("k-mer: "), F.col("kmer"), F.lit(" does not contain any valid contexts.")))
    )
    features = F.transform(
        F.sequence(F.lit(0), F.lit(N_CONTEXTS - 1)),
        lambda i: F.size(F.filter(checked, lambda x: x == i)) / n,
    )
    return kmer_counts.withColumn("label", F.log(F.col("cnt").cast("double"))).withColumn(
        "features", features
    )


def calibrate_kmers(kmer_counts: DataFrame) -> DataFrame:
    """(kmer, cnt) → (kmer, cnt) recalibrated (Tare.scala:110-136).

    The reference's accumulators for (n, Σ multiplicity)
    (Tare.scala:112-116) are an aggregation here — accumulators are not
    exactly-once under task retries (SURVEY.md A12).
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.regression import LinearRegression

    feats = featurize_kmers(kmer_counts).cache()

    stats = feats.agg(
        F.count("*").alias("n"), F.sum("cnt").alias("total_mult")
    ).select((F.log(F.col("total_mult") / F.col("n"))).alias("mean"))

    train = feats.select(F.col("label"), array_to_vector("features").alias("features"))
    model = LinearRegression(featuresCol="features", labelCol="label").fit(train)

    predicted = model.transform(
        feats.select("kmer", "cnt", "label", array_to_vector("features").alias("features"))
    )
    out = recalibrate_counts(predicted, stats)
    feats.unpersist()
    return out


def recalibrate_counts(predicted: DataFrame, stats: DataFrame) -> DataFrame:
    """P6 recalibration arithmetic (Tare.scala:125-130), factored out so
    the driver gate can hash-verify it with a synthetic ``prediction``
    column standing in for the model output (queries/genomics_q.py's
    ``kmer_bias_calibration``):

        count' = ⌊exp(mean + (label − prediction))⌋

    ``predicted`` needs (kmer, label, prediction); ``stats`` is the
    1-row (mean) aggregate, broadcast — the recalibration stays a pure
    projection, no shuffle."""
    return predicted.crossJoin(F.broadcast(stats)).select(
        "kmer",
        F.exp(F.col("mean") + (F.col("label") - F.col("prediction"))).cast("long").alias("cnt"),
    )


def calibrate_tx_len_bias(
    mu: DataFrame, t_len: DataFrame, sampling_rate: float = 1.0
) -> DataFrame:
    """(t_id, mu) → (t_id, mu) length-recalibrated (Tare.scala:150-193).

    OLS of y=log(µ) on x=log(len) with intercept, as closed-form
    population moments — algebraically identical to the reference's
    normal-equations solve, but distributed (no sample-collect needed;
    ``sampling_rate`` subsamples the *fit*, as in the reference).
    mean = −log(n) since abundances sum to 1 (Tare.scala:158-162).
    """
    joined = mu.join(F.broadcast(t_len), "t_id")
    fit_input = joined.sample(False, sampling_rate) if sampling_rate < 1.0 else joined
    xy = fit_input.select(
        F.log(F.col("t_len").cast("double")).alias("x"), F.log("mu").alias("y")
    )
    stats = xy.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("slope"),
        F.avg("x").alias("avg_x"),
        F.avg("y").alias("avg_y"),
        (-F.log(F.count("*").cast("double"))).alias("mean"),
    ).select(
        "slope",
        (F.col("avg_y") - F.col("slope") * F.col("avg_x")).alias("intercept"),
        "mean",
    )

    cal = mu.crossJoin(F.broadcast(stats)).select(
        "t_id",
        F.exp(
            F.col("mean") + ((F.col("slope") * F.col("mu") + F.col("intercept")) - F.col("mu"))
        ).alias("mu_cal"),
    )
    total = cal.agg(F.sum("mu_cal").alias("_total"))
    return cal.crossJoin(F.broadcast(total)).select(
        "t_id", (F.col("mu_cal") / F.col("_total")).alias("mu")
    )
