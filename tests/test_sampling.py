"""Deterministic sampling + per-group quantile filter (operators/sampling.py)."""

from pyspark.sql import functions as F

from rnadam_spark.operators import sampling


def _keys(df):
    return {r[0] for r in df.collect()}


def test_hash_sample_partitioning_invariant(spark):
    # the property df.sample() lacks: identical membership on any layout
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = _keys(sampling.hash_sample(df, "k", 0.2, seed=5).select("k"))
    b = _keys(sampling.hash_sample(df.repartition(13), "k", 0.2, seed=5).select("k"))
    c = _keys(sampling.hash_sample(df.coalesce(1), "k", 0.2, seed=5).select("k"))
    assert a == b == c
    assert 0.16 * 5000 <= len(a) <= 0.24 * 5000


def test_hash_sample_seeds_independent(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = _keys(sampling.hash_sample(df, "k", 0.1, seed=1).select("k"))
    b = _keys(sampling.hash_sample(df, "k", 0.1, seed=2).select("k"))
    # expected overlap of independent 10% samples: ~1% of rows
    assert len(a & b) < 0.03 * 20000


def test_stratified_rates(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(10000)]
    df = spark.createDataFrame(rows, "k BIGINT, s STRING")
    got = sampling.stratified_hash_sample(
        df, "s", {"a": 0.5, "b": 0.05}, "k", default_fraction=0.0, seed=9
    )
    counts = {r.s: r.n for r in got.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 0.4 * 5000 <= counts["a"] <= 0.6 * 5000
    assert counts.get("b", 0) <= 0.1 * 5000


def test_stratified_default_drops_unlisted(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k BIGINT, s STRING")
    assert sampling.stratified_hash_sample(df, "s", {"x": 1.0}, "k").count() == 1


def test_top_fraction_golden(spark):
    # scores 1..8 in one group: top 25% by percent_rank = pr <= 0.25
    # -> ranks 1..2 of 8 (pr 0 and 1/7)
    rows = [(i, "g", float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    got = sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id")
    assert _keys(got.select("doc_id")) == {8, 7}


def test_top_fraction_threshold_golden(spark):
    # scores 1..8 in one group: the exact 75th-percentile threshold is
    # 1 + 0.75*7 = 6.25, so score >= 6.25 keeps {7, 8}
    rows = [(i, "g", float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    got = sampling.top_fraction_per_group_threshold(df, "src", "score", 0.25)
    assert _keys(got.select("doc_id")) == {8, 7}


def test_top_fraction_threshold_matches_rank_form(spark):
    # the broadcast-threshold form keeps the same set as the percent_rank
    # form up to boundary ties (which the threshold form keeps entirely)
    rows = [(i, f"s{i % 4}", float((i * 37) % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    rank = _keys(
        sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id").select("doc_id")
    )
    thr = _keys(
        sampling.top_fraction_per_group_threshold(df, "src", "score", 0.25).select("doc_id")
    )
    assert len(thr ^ rank) <= 0.02 * len(thr | rank) + 8  # boundary rows only


def test_top_fraction_approx_matches_exact(spark):
    rows = [(i, f"s{i % 4}", float((i * 37) % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    exact = _keys(
        sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id").select("doc_id")
    )
    approx = _keys(
        sampling.top_fraction_per_group_approx(df, "src", "score", 0.25).select("doc_id")
    )
    # sketch boundary wobble only: symmetric difference stays small
    assert len(exact ^ approx) <= 0.02 * len(exact | approx) + 8
