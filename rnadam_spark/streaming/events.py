"""Structured Streaming over the events table.

The reference is batch-only (SURVEY.md §2.7) — this is north-star
surface: the batch queries in ``queries/windows_q.py`` (hourly rollup,
sessionization) get streaming twins here with watermarks, so the same
logical aggregation runs incrementally on an unbounded source. Local
tests drive the parquet file through the streaming engine with a memory
sink + ``processAllAvailable`` (deterministic, synchronous).

At scale the source would be Kafka/files-on-arrival; everything below
the source line is unchanged — that's the point of expressing the
operators declaratively.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _source_dir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """The file stream source watches a *directory*. A table that is
    already a directory (the normal layout on a cluster / object store)
    is watched in place. The local driver harness ships single parquet
    FILES — for those, stage a one-file watch directory by copying
    through the Hadoop FileSystem API (portable to HDFS and object
    stores, unlike a symlink; the source tree is read-only so the
    directory can't be created in place). The copy is keyed by source
    path and done once per staging root."""
    src = posixpath.join(sf_dir, f"{name}.parquet")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jsrc = jvm.org.apache.hadoop.fs.Path(src)
    src_fs = jsrc.getFileSystem(hconf)
    jsrc = src_fs.makeQualified(jsrc)
    if src_fs.getFileStatus(jsrc).isDirectory():
        return src
    stage_root = jvm.java.lang.System.getProperty("java.io.tmpdir")
    stage = posixpath.join(
        stage_root, f"rnadam_stream_src_{name}_" + sf_dir.strip("/").replace("/", "_")
    )
    jstage = jvm.org.apache.hadoop.fs.Path(stage)
    stage_fs = jstage.getFileSystem(hconf)
    dst = jvm.org.apache.hadoop.fs.Path(stage, f"{name}.parquet")
    if not stage_fs.exists(dst):
        stage_fs.mkdirs(jstage)
        jvm.org.apache.hadoop.fs.FileUtil.copy(src_fs, jsrc, stage_fs, dst, False, hconf)
    return stage


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Any driver table as a file-stream source (schema probed from the
    parquet footer — streams require a declared schema). Batch-authored
    stateless operators (PII scrub, quality scoring, lang-ID, chunking)
    compose on the result unchanged: that is the point of writing them
    as declarative projections.

    The probe relies on ``spark.sql.legacy.parquet.nanosAsLong`` being
    set engine-wide (session.get_spark), so a TIMESTAMP(NANOS) column
    probes as bigint instead of throwing; note ``events`` additionally
    needs the ts normalization in :func:`read_events_stream` — use that
    entry point for it."""
    stage = _source_dir(spark, sf_dir, name)
    schema = spark.read.parquet(posixpath.join(sf_dir, f"{name}.parquet")).schema
    return spark.readStream.schema(schema).format("parquet").load(stage)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events as a stream, with ``ts`` normalized to a session-TZ
    TIMESTAMP whatever the parquet physical type is (the streaming twin
    of sources.tables._load_events — same branches, same UTC
    reinterpretation)."""
    src = posixpath.join(sf_dir, "events.parquet")
    stage = _source_dir(spark, sf_dir, "events")
    schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    dt = dict(raw.dtypes).get("ts")
    if dt == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        # session TZ is pinned UTC: the cast reinterprets naive as UTC,
        # matching the batch loader and the DuckDB oracle
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``hourly_event_rollup``: tumbling
    1-hour windows with a 2-hour watermark for late data."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("bucket"), "event_type", "n", "total_value")
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming twin of the batch lag-gap sessionization, using the
    built-in ``session_window`` (merges events closer than ``gap``)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )


USER_STATS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_USER_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def user_running_stats_stream(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value total), re-emitted on every microbatch
    that touches the user. This is the escape hatch for stateful logic
    the built-in window/session aggregates can't express (the reference
    has no streaming at all — north-star surface, SURVEY.md §2.7).

    Scale notes: state is one tiny tuple per user key, partitioned by
    the groupBy hash — memory ∝ distinct users per executor, not events;
    Arrow batches keep the Python boundary amortized. ``idle_timeout_ms``
    arms a processing-time GroupStateTimeout: a
    user idle past the horizon has its state dropped, so state size is
    bounded by ACTIVE keys, not all keys ever seen — without it, an
    unbounded user ID space grows state forever (the 100 TB failure
    mode). A timed-out key that reappears re-initializes from zero."""
    import pandas as pd

    def update(key, pdfs, state):
        if state.hasTimedOut:
            # idle past the horizon: drop the state (emit nothing — a
            # production variant could emit a final tombstone row here)
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS,
        stateStructType=_USER_STATE,
        outputMode="update",
        timeoutConf="ProcessingTimeTimeout" if idle_timeout_ms is not None else "NoTimeout",
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first occurrence of each event_id wins,
    duplicates arriving within the watermark horizon are dropped —
    the incremental twin of the batch ``exact_dup_groups`` canonical
    selection (at-least-once sources like Kafka re-deliver; this is the
    standard exactly-once-ification layer).

    ``dropDuplicatesWithinWatermark`` keys state by event_id and EXPIRES
    each key once the watermark passes its event time — state is
    bounded by the horizon's key cardinality, not the stream's lifetime
    (plain ``dropDuplicates`` on an unbounded stream grows state
    forever; that's the 100 TB failure mode this avoids)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming DataFrame to completion against the current
    (bounded) source and return the materialized result."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
