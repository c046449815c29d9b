"""functions/runlength.py: per-row value counts + class grouping must
match the shuffle-based (explode → groupBy) computation exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from rnadam_spark.functions.runlength import count_classes, with_value_counts
from rnadam_spark.functions.shingles import char_shingles
from rnadam_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_value_counts_matches_explode_groupby(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    mapside = (
        with_value_counts(docs, char_shingles("text", 5), "kc")
        .select("doc_id", F.explode("kc").alias("x"))
        .select("doc_id", F.col("x.value").alias("kmer"), F.col("x.cnt").alias("cnt"))
    )
    shuffled = (
        docs.select("doc_id", F.explode(char_shingles("text", 5)).alias("kmer"))
        .groupBy("doc_id", "kmer")
        .agg(F.count("*").alias("cnt"))
    )
    a = sorted(tuple(r) for r in mapside.collect())
    b = sorted(tuple(r) for r in shuffled.collect())
    assert a == b
    assert a  # non-empty


def test_value_counts_short_and_empty_strings(spark):
    df = spark.createDataFrame(
        [(1, "abcab"), (2, "abc"), (3, ""), (4, "zz"), (5, "aaaaaa")], "id INT, s STRING"
    )
    out = {
        r["id"]: [(x["value"], x["cnt"]) for x in r["kc"]]
        for r in with_value_counts(df, char_shingles("s", 3), "kc").collect()
    }
    assert out[1] == [("abc", 1), ("bca", 1), ("cab", 1)]
    assert out[2] == [("abc", 1)]
    assert out[3] == []  # shorter than k -> no shingles
    assert out[4] == []
    assert out[5] == [("aaa", 4)]


def test_count_classes_matches_groupby(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    vc = with_value_counts(docs, char_shingles("text", 5), "kc")
    mapside = vc.select("doc_id", F.explode(count_classes(F.col("kc"))).alias("cl")).select(
        "doc_id", "cl.cnt", "cl.class_id", "cl.n_kmers"
    )
    shuffled = (
        docs.select("doc_id", F.explode(char_shingles("text", 5)).alias("kmer"))
        .groupBy("doc_id", "kmer")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "cnt")
        .agg(
            F.md5(F.array_join(F.sort_array(F.collect_list("kmer")), "|")).alias("class_id"),
            F.count("*").alias("n_kmers"),
        )
    )
    a = sorted(tuple(r) for r in mapside.collect())
    b = sorted(tuple(r) for r in shuffled.collect())
    assert a == b
    assert a
