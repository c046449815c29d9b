"""SparkSession factory.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads), but every config here is chosen so the same plans scale to a
multi-executor cluster: AQE for runtime re-planning (partition
coalescing + skew-join splitting), Arrow for the Python boundary, UTC
session timezone so results are comparable to the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "rnadam-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    AQE is enabled so the static ``spark.sql.shuffle.partitions`` is an
    upper bound, not a commitment: at 100 TB the same code runs with a
    much larger setting and AQE coalesces/splits per-stage at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's testdata has shipped events.ts as TIMESTAMP(NANOS),
        # which the vectorized parquet reader rejects; the legacy conf
        # reads it as raw INT64 and sources.tables._load_events truncates
        # to micros. Engine-wide here (with the UTC pin) so no read
        # helper mutates session config mid-flight; sessions not built by
        # this factory get the same conf set defensively in _load_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate infers `size(e) > 0 AND isnotnull(e)`
        # from every explode(e) and pushes it below exchanges — with e
        # an ATTRIBUTE that is free, but this engine's explodes are
        # mostly over COMPUTED arrays (char_shingles, value_counts,
        # token n-grams: interpreted higher-order functions), and the
        # inferred filter duplicates the full expression twice more,
        # often below the widen repartition where parallelism is still
        # scan-bound. Measured at sf1: the EM flagship's run-length
        # kernel -> explode dropped 31.2s -> 1.6s and kmer_count 2.1s
        # -> 1.4s with the rule excluded. Semantically inert: explode
        # (non-outer) already drops null/empty arrays, so the filter
        # can never change results, only plan shape.
        .config(
            "spark.sql.optimizer.excludedRules",
            os.environ.get(
                "SPARK_GRAFT_EXCLUDED_RULES",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
