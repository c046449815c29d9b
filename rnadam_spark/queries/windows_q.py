"""Window-function operators: running totals, top-k per group, lag
deltas, sessionization, as-of joins, time-bucketed rollups.

The reference's E-step is semantically a windowed fraction-of-group
(SURVEY.md A9, Quantify.scala:200-212 — flatMap+groupByKey re-expressed
as ``sum() OVER (PARTITION BY ...)``); everything else here is §2.7
standard surface. Every window is ordered by a unique tiebreak column
(event_id / orderkey) so both engines produce identical frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rnadam_spark.functions.rounding import hround
from rnadam_spark.registry import query
from rnadam_spark.sources.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def fraction_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (EM E-step shape): per-row fraction of its group's total.

    The reference shuffled twice (flatMap → groupByKey → re-emit,
    Quantify.scala:200-212); a window aggregate computes it in one
    shuffle with no regrouping.

    Not registered: the same E-step arithmetic is hash-verified inside
    ``em_two_steps`` (alpha1 CTE) through the production ``quantify()``
    path; retired so all registered queries fit the driver's 50-entry
    gate. Plan contract pinned by tests/test_plans.py, timing by bench.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    return ev.select(
        "event_id", "event_type", hround(F.col("value") / F.sum("value").over(w), 6).alias("frac")
    )


def split_count_equally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 (EM init shape): divide a group total equally among members
    (Quantify.scala:175-184's classCount / numTranscripts).

    Not registered: the same init arithmetic is hash-verified inside
    ``em_two_steps`` (alpha0 CTE) through the production ``quantify()``
    path; retired so all registered queries fit the driver's 50-entry
    gate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("l_orderkey")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            hround(F.col("o_totalprice") / F.count("*").over(w), 4).alias("w_split"),
        )
    )


def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key: ordered frame with unique tiebreak.

    Not registered (gate rotation r7, second wave): the ordered-frame
    running-sum kernel stays hash-verified inside ``sessionize_events``
    (its session ids are a conditional running sum over the same
    partition-ordered frame shape); the standalone row retired to make
    room for ``dsir_log_weights``."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", hround(F.sum("o_totalprice").over(w), 4).alias("cum_spend")
    )


@query(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, revenue, rn FROM (
      SELECT p_brand, p_partkey,
             floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS revenue,
             CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 DESC, p_partkey) AS BIGINT) AS rn
      FROM part JOIN lineitem ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    ) ranked
    WHERE rn <= 3
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: agg → row_number window → filter (§2.7)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(hround(F.sum("l_extendedprice"), 4).alias("revenue"))
    )
    w = W.partitionBy("p_brand").orderBy(F.col("revenue").desc(), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rn")
    )


def event_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta per key (first row NULL on both engines).

    Unregistered since round 6 (gate capped at 50; the curation
    repetition/chunk/vocabulary operators took the slots): the lag
    window kernel stays hash-verified via ``sessionize_events``, whose
    oracle is built on the same ``lag() OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", hround(F.col("value") - F.lag("value").over(w), 4).alias("delta")
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH stamped AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                       > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
      FROM stamped
    ), sessioned AS (
      SELECT user_id, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag → cumulative sum → roll-up.

    Integer microsecond arithmetic end-to-end, so the oracle comparison
    is exact. The streaming twin (``session_window``) lives in
    rnadam_spark.streaming.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w_order = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w_order) > SESSION_GAP_US, 1).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w_order.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("span_us"),
    )


@query(
    "asof_purchase_view",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE event_type IN ('purchase', 'view')
    ), enriched AS (
      SELECT user_id, event_id, event_type, ts_us,
             last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
      FROM tagged
    )
    SELECT user_id, event_id, ts_us, prev_view_us
    FROM enriched WHERE event_type = 'purchase'
    """,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.7; Spark lacks a native one): each purchase picks
    the most recent strictly-prior view for the same user.

    Expressed as a union-scan + IGNORE NULLS last_value over a
    preceding frame — one shuffle on user_id, no range-join blowup;
    this is the shape that survives 100 TB (the naive
    purchase×view-per-user join is quadratic in the hot user).
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    enriched = tagged.withColumn(
        "prev_view_us",
        F.last(F.when(F.col("event_type") == "view", F.col("ts_us")), ignorenulls=True).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", "prev_view_us"
    )


_HOURLY_SQL = """
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (streaming twin uses
    ``window(ts, '1 hour')`` — rnadam_spark.streaming.events).

    Retired from the gate in the round-10 rotation to make room for
    ``pack_sequences``: the tumbling-bucket kernel is a strict subset
    of ``sessionize_events``' window arithmetic and the streaming twin
    keeps its own golden; ``_HOURLY_SQL`` stays the oracle for the
    pytest cross-check (tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type").agg(
        F.count("*").alias("n"), hround(F.sum("value"), 4).alias("total_value")
    )
