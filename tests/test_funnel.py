"""Curation-funnel audit (operators/funnel.py): one-pass stage
attribution must agree with actually running the stages sequentially."""

from __future__ import annotations

from pyspark.sql import functions as F

from rnadam_spark.operators.funnel import curation_funnel
from rnadam_spark.operators.repetition import repetition_stats
from rnadam_spark.operators.text import c4_clean, quality_scores
from rnadam_spark.sources.tables import load_table


def test_funnel_golden(spark):
    rows = [
        # passes everything
        (1, "A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?"),
        # duplicate of 1 -> dropped at exact_dup
        (2, "A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?"),
        # c4 page drop (brace)
        (3, "code { x }\nMore words on this line here.\nThird line of words here."),
        # fails quality (digit soup) but passes c4? -> craft: high digits
        (4, "Numbers 111 222 333 444 555 666 go marching onward.\n"
            "Numbers 777 888 999 000 111 222 go marching onward.\n"
            "Numbers 333 444 555 666 777 888 go marching onward."),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.stage: (r.n_dropped, r.n_remaining) for r in curation_funnel(docs, quality_min=0.9).collect()}
    assert got["input"] == (0, 4)
    assert got["c4"] == (1, 3)          # doc 3
    assert got["quality"][0] == 1       # doc 4
    assert got["repetition"] == (0, 2)  # disabled
    assert got["exact_dup"] == (1, 1)   # doc 2 loses to doc 1


def test_funnel_matches_sequential_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    qmin, rmax = 0.9, 0.5
    got = {r.stage: r for r in curation_funnel(
        docs, quality_min=qmin, use_c4=False, max_dup_5gram=rmax
    ).collect()}
    n0 = docs.count()
    q = quality_scores(docs).filter(F.col("quality") >= qmin).select("doc_id")
    s1 = docs.join(q, "doc_id")
    n1 = s1.count()
    rep = repetition_stats(s1).filter(F.col("dup_5gram_char_frac") <= rmax).select("doc_id")
    s2 = s1.join(rep, "doc_id")
    n2 = s2.count()
    n3 = s2.select(F.md5("text")).distinct().count()
    assert got["input"].n_remaining == n0
    assert got["c4"].n_dropped == 0
    assert got["quality"].n_dropped == n0 - n1
    assert got["repetition"].n_dropped == n1 - n2
    assert got["exact_dup"].n_remaining == n3


def test_funnel_gopher_stage(spark):
    good = ("The dataset pipeline needs to be clean and it must have documents "
            "that read like prose with normal words of sensible length so the "
            "filters keep them here today. ") * 3
    bullets = "\n".join("• item number " + str(i) for i in range(10))
    docs = spark.createDataFrame([(1, good), (2, bullets)], ["doc_id", "text"])
    got = {
        r.stage: (r.n_dropped, r.n_remaining)
        for r in curation_funnel(
            docs, quality_min=0.0, use_c4=False, use_gopher=True
        ).collect()
    }
    assert got["gopher"] == (1, 1)  # the bullet page
    assert got["exact_dup"] == (0, 1)
    # default off: stage present with zero drops (stable funnel shape)
    off = {
        r.stage: r.n_dropped
        for r in curation_funnel(docs, quality_min=0.0, use_c4=False).collect()
    }
    assert off["gopher"] == 0
