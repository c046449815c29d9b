"""Bitmap-exact and HLL distinct counts (operators/sketches.py) and the
boilerplate n-gram miner (operators/repetition.boilerplate_ngrams)."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rnadam_spark.operators import repetition, sketches


def test_bitmap_distinct_matches_count_distinct(spark):
    rng = random.Random(17)
    rows = [
        (rng.randrange(5), rng.choice([None, rng.randrange(0, 100_000)]))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "g int, v bigint")
    got = {
        r["g"]: r["n_distinct"]
        for r in sketches.distinct_counts_bitmap(df, ["g"], "v").collect()
    }
    want = {
        r["g"]: r["cd"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("cd")).collect()
    }
    assert got == want


def test_bitmap_distinct_large_sparse_domain(spark):
    # values far above one bucket (32768 bits) exercise the bucket split
    df = spark.range(0, 3000).selectExpr("id % 3 as g", "id * 1000003 as v")
    out = sketches.distinct_counts_bitmap(df, ["g"], "v").collect()
    assert {r["g"]: r["n_distinct"] for r in out} == {0: 1000, 1: 1000, 2: 1000}


def test_bitmap_distinct_all_null_group_counts_zero(spark):
    """A group whose values are ALL NULL must appear with count 0 —
    exactly what groupBy().agg(count_distinct(v)) returns — rather than
    vanishing from the output via a pre-filter."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), ("b", None)], "g string, v bigint"
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in sketches.distinct_counts_bitmap(df, ["g"], "v").collect()
    }
    want = {
        r["g"]: r["cd"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("cd")).collect()
    }
    assert got == want == {"a": 1, "b": 0}


def test_bitmap_distinct_rejects_negative(spark):
    df = spark.createDataFrame([(1, -5)], "g int, v bigint")
    with pytest.raises(Exception, match="non-negative"):
        sketches.distinct_counts_bitmap(df, ["g"], "v").collect()


def test_bitmap_distinct_plan_has_no_raw_value_exchange(spark):
    """The first shuffle must carry (group, bucket, bitmap) partials:
    the plan shows a partial bitmap_construct_agg BELOW the exchange
    and no expand/count(distinct) form."""
    df = spark.range(0, 100).selectExpr("id % 3 as g", "id as v")
    plan = sketches.distinct_counts_bitmap(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "bitmap_construct_agg" in plan
    assert "Expand" not in plan  # the count(distinct) rewrite marker


def test_approx_distinct_within_rsd(spark):
    df = spark.range(0, 50_000).selectExpr("0 as g", "id as v")
    got = sketches.approx_distinct(df, ["g"], "v", rsd=0.02).collect()[0]["n_distinct_approx"]
    assert abs(got - 50_000) / 50_000 < 0.06  # 3x rsd slack


def _py_boilerplate(texts: dict[int, str], n: int) -> dict[str, tuple[int, int]]:
    df_c: Counter[str] = Counter()
    tf_c: Counter[str] = Counter()
    for _doc, body in texts.items():
        toks = [t for t in body.split() if t]
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        tf_c.update(grams)
        df_c.update(set(grams))
    return {g: (df_c[g], tf_c[g]) for g in df_c}


def test_boilerplate_ngrams_matches_python_reference(spark):
    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "cookie", "accept", "terms"]
    texts = {}
    banner = "accept cookie terms"
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
        if i % 3 == 0:
            words = banner.split() + words
        texts[i] = " ".join(words)
    docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = {
        r["gram"]: (r["df"], r["tf"])
        for r in repetition.boilerplate_ngrams(docs, n=3, min_df=1).collect()
    }
    assert got == _py_boilerplate(texts, 3)


def test_boilerplate_ngrams_min_df_and_top_k(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "a b c x"), (4, "z z z z")],
        "doc_id bigint, text string",
    )
    all_rows = repetition.boilerplate_ngrams(docs, n=3, min_df=2).collect()
    by_gram = {r["gram"]: (r["df"], r["tf"]) for r in all_rows}
    # "a b c" in docs 1,2,3; "b c x" in docs 2,3; "z z z" df=1 (tf=2) filtered
    assert by_gram == {"a b c": (3, 3), "b c x": (2, 2)}
    top = repetition.boilerplate_ngrams(docs, n=3, min_df=1, top_k=1).collect()
    assert [r["gram"] for r in top] == ["a b c"]
