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
            est = _estimated_scan_tasks(spark, df)
            needs = est is not None and est < target
            _SCAN_PARALLELISM_CACHE[key] = needs
        if needs:
            df = df.repartition(target)
    return df


_SCAN_PARALLELISM_CACHE: dict[tuple[str, int], bool] = {}


def _conf_bytes(spark: SparkSession, name: str, default: int) -> int:
    try:
        raw = spark.conf.get(name, str(default))
        return int(str(raw).lower().rstrip("b"))
    except ValueError:
        return default


def _estimated_scan_tasks(spark: SparkSession, df: DataFrame) -> int | None:
    """Estimate the scan's task count from file metadata alone,
    replicating FilePartition.maxSplitBytes — no RDD conversion, no
    physical-plan compile (driver-side listing + os.stat only)."""
    import math

    sizes = []
    for uri in df.inputFiles():
        p = uri[len("file:") :] if uri.startswith("file:") else uri
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            return None  # non-local FS: fall back to "already parallel"
    if not sizes:
        return 0
    max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
    total = sum(s + open_cost for s in sizes)
    max_split = max(
        1, min(max_part, max(open_cost, total // spark.sparkContext.defaultParallelism))
    )
    # files split into <= max_split chunks, then chunks (+ open cost)
    # pack into partitions — the packing bound caps the chunk count
    chunks = sum(math.ceil(s / max_split) for s in sizes if s) or len(sizes)
    return min(chunks, math.ceil(total / max_split))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize ``ts`` to a session-TZ TIMESTAMP whatever the parquet
    physical type is — the driver has shipped this column as both
    TIMESTAMP(NANOS) (vectorized reader rejects it; read as raw INT64
    via the legacy conf and truncate to micros) and plain
    timestamp[us] without UTC adjustment (Spark 4 infers
    TIMESTAMP_NTZ, which unix_micros/window() reject). The session
    timezone is pinned to UTC (session.py), so casting NTZ → TIMESTAMP
    reinterprets the naive value as UTC — exactly what DuckDB's
    ``epoch_us(ts)`` does, keeping oracle comparisons bit-identical.

    NOTE: the two ``spark.conf.set`` calls below are SESSION-GLOBAL.
    Sessions built by session.get_spark already carry both settings, so
    they are no-ops there; for a foreign session (the driver's
    correctness harness) the first touch of events pins that session to
    UTC + nanos-as-long for the rest of its lifetime — deliberate, so
    every later timestamp query agrees with the DuckDB oracle."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ→TIMESTAMP cast below reinterprets in the SESSION timezone;
    # our own session factory pins UTC, but the driver's correctness
    # harness runs these queries in ITS session — pin there too so the
    # epoch arithmetic stays oracle-identical wherever we run
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
