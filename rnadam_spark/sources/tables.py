"""Parquet sources for the driver-provided tables (TESTDATA.md).

Mirrors the reference's sources S1–S4 (SURVEY.md §2.1): ADAM's
``loadAlignments`` / ``loadGenes`` / Parquet-Avro scans all become plain
``spark.read.parquet`` so Catalyst gets predicate pushdown and column
pruning for free (the reference materialized full Avro records,
rice-cli/.../cli/Quantify.scala:76-90 — we never do).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str, widen: bool = False) -> DataFrame:
    """Read one driver table.

    ``widen=True`` requests a round-robin repartition up to the
    cluster's core count when the scan itself is under-parallel. Use it
    at call sites whose downstream per-row work is heavy (shingle
    explode multiplies rows ~300×, MinHash evaluates many hashes per
    row): a parquet file splits only at row-group boundaries, so a
    single-row-group file scans as ONE task and every narrow stage
    chained onto it inherits that. Agg-first queries should NOT widen —
    the exchange of raw rows costs more than the single-task partial
    aggregate it replaces. Self-tuning at scale: real multi-row-group
    inputs already scan with >= cores partitions and skip the exchange.
    Catalyst still pushes filters/pruning through the repartition to
    the scan.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _load_events(spark, path)
    else:
        df = spark.read.parquet(path)
    if widen and os.environ.get("SPARK_GRAFT_SCAN_REPARTITION", "1") != "0":
        target = spark.sparkContext.defaultParallelism
        key = (path, target)
        needs = _SCAN_PARALLELISM_CACHE.get(key)
        if needs is None:
            # .rdd compiles the physical plan — do it once per table path
            needs = df.rdd.getNumPartitions() < target
            _SCAN_PARALLELISM_CACHE[key] = needs
        if needs:
            df = df.repartition(target)
    return df


_SCAN_PARALLELISM_CACHE: dict[tuple[str, int], bool] = {}


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet stores ``ts`` as Parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. Read nanos as raw INT64
    (legacy conf) and truncate to a microsecond timestamp — the same
    truncation DuckDB applies, so oracle comparisons agree. The conf is
    session-wide but only affects TIMESTAMP(NANOS) columns, which no
    other table has."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
