"""Bucketed table layout — co-located joins without exchanges.

At 100 TB the dominant cost of a large-large equi-join is shuffling both
sides. Writing both tables bucketed (hash-clustered into a fixed number
of files) on the join key persists that partitioning: Spark's bucketed
scan reports HashPartitioning(key, n) and EnsureRequirements inserts NO
Exchange — the join runs bucket-against-bucket, local to each task.
This is the DataFrame analog of the reference's implicit reliance on
pair-RDD hash partitioning (SURVEY.md §4 "partitioning control: none"),
made explicit and persistent.

Plan contract (pinned by tests/test_bucketing.py): joining two tables
bucketed on the same key with the same bucket count executes with zero
shuffle exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-clustered into ``n_buckets`` files on
    ``bucket_col`` (sorted within buckets so merge joins skip the sort
    when bucket files are single). ``path`` makes it an external table;
    bucketing metadata requires the table catalog, so this is
    ``saveAsTable``, not a bare ``parquet()`` write."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
