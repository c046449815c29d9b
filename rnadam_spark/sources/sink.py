"""Curated-corpus sinks: partitioned layout + small-file compaction.

The output side of a 100 TB curation pipeline matters as much as the
operators: a training job reads the curated corpus many times, so the
layout should (a) partition-prune on the columns readers filter by
(lang, source), (b) cluster related rows inside files so row-group
stats prune within files, and (c) avoid the two classic write
pathologies — one giant file per partition (no read parallelism) and
thousands of tiny files (listing + open cost dominates; the "small
files problem").

``maxRecordsPerFile`` bounds file size without an extra exchange;
``sortWithinPartitions`` orders rows inside each task's files so
min/max row-group stats are selective. Compaction rewrites a dataset
that accumulated small files (incremental appends, streaming sinks)
into size-targeted files — the maintenance op every table format
(Delta/Iceberg/Hudi) schedules; here expressed as plain Spark over
parquet directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Hive-partitioned parquet sink. ``partition_by`` should be the
    low-cardinality columns readers filter on (partition pruning skips
    whole directories); ``sort_by`` clusters rows within each written
    file so row-group min/max stats prune within files too."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def _data_files(path: str) -> list[str]:
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    return files


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet dataset into ≈``target_file_bytes`` files;
    returns the file count written. Sizing reads only driver-side file
    metadata (os.stat over the listing — no data scan, no RDD
    materialization), then one round-robin repartition spreads rows
    evenly across the target count. Partition columns of a Hive layout
    are re-materialized by the read, so compacting a partitioned
    dataset flattens it — compact per-partition-directory to keep the
    layout."""
    total = sum(os.path.getsize(f) for f in _data_files(path))
    n_files = max(1, round(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
