"""Curation-funnel audit: per-stage drop counts in one pass.

Operating a 100 TB curation pipeline needs the answer to "where did my
corpus go?" — how many documents each stage dropped — WITHOUT running
the pipeline once per stage. This operator evaluates every stage's
predicate as a column in a single scan, attributes each document to its
FIRST failing stage (the same sequential semantics the ``curate`` CLI
applies), and aggregates one tiny funnel table.

Cost shape: the stage predicates (C4, quality, repetition) are the same
zero-shuffle projections the pipeline itself uses; the only exchanges
are the exact-dup canonical groupBy over stage-survivors (which the
real pipeline pays anyway) and the final stages-sized aggregation.
Contrast with the naive audit — re-running the pipeline k times with k
prefixes — which scans the corpus k times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STAGES = ("c4", "gopher", "quality", "repetition", "exact_dup")


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.9,
    use_c4: bool = True,
    use_gopher: bool = False,
    max_dup_5gram: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(stage, n_dropped, n_remaining): documents dropped at each
    curation stage, in pipeline order (c4 → gopher → quality →
    repetition → exact_dup), plus an ``input`` row anchoring the
    starting count. Disabled stages (``use_c4=False`` /
    ``use_gopher=False`` / ``max_dup_5gram=None``) appear with
    ``n_dropped = 0`` so the funnel shape is stable for dashboards.
    ``n_remaining`` after ``exact_dup`` is the corpus the ``curate``
    CLI would hand to chunking/sharding under the same thresholds."""
    from rnadam_spark.operators.repetition import repetition_stats
    from rnadam_spark.operators.text import c4_clean, gopher_quality, quality_scores

    if use_c4:
        c4 = c4_clean(docs, text_col=text_col, id_col=id_col)
        pass_c4 = c4.select(id_col, F.col("keep_doc").alias("_p_c4"))
        # gopher must judge the text the PIPELINE's gopher stage sees —
        # the C4-rewritten lines, not the raw page (C4 line-filtering
        # changes word and line counts, so raw-text gopher counts would
        # disagree with actual drops)
        gopher_input = c4.select(id_col, F.col(text_col))
    else:
        pass_c4 = docs.select(id_col, F.lit(True).alias("_p_c4"))
        gopher_input = docs.select(id_col, F.col(text_col))
    pass_g = (
        gopher_quality(gopher_input, text_col=text_col, id_col=id_col)
        .select(id_col, F.col("keep_doc").alias("_p_g"))
        if use_gopher
        else docs.select(id_col, F.lit(True).alias("_p_g"))
    )
    pass_q = quality_scores(docs, text_col=text_col, id_col=id_col).select(
        id_col, (F.col("quality") >= quality_min).alias("_p_q")
    )
    pass_rep = (
        repetition_stats(docs, text_col=text_col, id_col=id_col).select(
            id_col, (F.col("dup_5gram_char_frac") <= max_dup_5gram).alias("_p_rep")
        )
        if max_dup_5gram is not None
        else docs.select(id_col, F.lit(True).alias("_p_rep"))
    )
    flagged = (
        docs.select(id_col, F.md5(F.col(text_col)).alias("_h"))
        .join(pass_c4, id_col)
        .join(pass_g, id_col)
        .join(pass_q, id_col)
        .join(pass_rep, id_col)
    )
    # survivors of the projection stages compete for exact-dup canonical
    surv = flagged.filter("_p_c4 AND _p_g AND _p_q AND _p_rep")
    canon = surv.groupBy("_h").agg(F.min(id_col).alias("_canonical"))
    # hash-keyed join, NOT broadcast: canon has one row per distinct
    # surviving content hash — corpus-scale, never driver-size
    flagged = flagged.join(canon, "_h", "left").withColumn(
        "_p_dup", F.col("_canonical") == F.col(id_col)
    )
    first_fail = (
        F.when(~F.col("_p_c4"), "c4")
        .when(~F.col("_p_g"), "gopher")
        .when(~F.col("_p_q"), "quality")
        .when(~F.col("_p_rep"), "repetition")
        .when(~F.coalesce(F.col("_p_dup"), F.lit(False)), "exact_dup")
        .otherwise(F.lit(None).cast("string"))
    )
    drops = {
        r["_fail"]: r["n"]
        for r in flagged.select(first_fail.alias("_fail"))
        .groupBy("_fail")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(drops.values())
    rows = [("input", 0, total)]
    remaining = total
    for stage in FUNNEL_STAGES:
        d = drops.get(stage, 0)
        remaining -= d
        rows.append((stage, d, remaining))
    return docs.sparkSession.createDataFrame(
        rows, "stage STRING, n_dropped BIGINT, n_remaining BIGINT"
    )
