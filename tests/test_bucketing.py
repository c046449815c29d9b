"""Bucketed co-located joins: the persisted-partitioning contract."""

from pyspark.sql import functions as F

from rnadam_spark.plans import count_shuffles
from rnadam_spark.sources.bucketing import read_bucketed, write_bucketed
from rnadam_spark.sources.tables import load_table


def test_bucketed_join_zero_exchange(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", F.length("text").alias("n"))
    try:
        write_bucketed(docs.select("doc_id", "lang"), "b_docs", "doc_id", 8,
                       path=str(tmp_path / "b_docs"))
        write_bucketed(stats, "b_stats", "doc_id", 8, path=str(tmp_path / "b_stats"))

        joined = read_bucketed(spark, "b_docs").join(read_bucketed(spark, "b_stats"), "doc_id")
        # both sides report HashPartitioning(doc_id, 8) from the bucketed
        # scan, so EnsureRequirements inserts no Exchange at all
        assert count_shuffles(joined) == 0
        assert joined.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_bucketed_aggregation_zero_exchange(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    try:
        write_bucketed(docs.select("doc_id", "lang"), "b_docs2", "doc_id", 8,
                       path=str(tmp_path / "b_docs2"))
        agg = read_bucketed(spark, "b_docs2").groupBy("doc_id").agg(F.count("*").alias("n"))
        # grouping on the bucket key reuses the persisted clustering too
        assert count_shuffles(agg) == 0
        assert agg.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs2")
