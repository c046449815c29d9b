"""Approximate aggregates (§2.7) — tolerance-checked against exact.

Approx sketches (HLL++, t-digest) are the 100 TB scale path for NDV and
quantiles: single-pass, fixed memory, mergeable across partitions — no
sort, no expand. They can't hash-match a DuckDB oracle (different
sketches per engine), so the gate is a relative-error bound against the
exact computation on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rnadam_spark.sources.tables import load_table


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05


def test_approx_count_distinct_grouped(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) <= 0.05


def test_percentile_approx_within_tolerance(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        (F.max("value") - F.min("value")).alias("spread"),
    ).first()
    # high-accuracy t-digest: within 1% of the value spread
    assert abs(row["approx"] - row["exact"]) <= 0.01 * row["spread"]


def test_money_decimal_cast_identical_across_engines(spark, sf_dir):
    # the money_sum contract (functions/rounding.py): double ->
    # DECIMAL(38,10) is a deterministic per-row function both engines
    # compute identically, so the exact decimal SUM is order- and
    # engine-independent. Pinned row-for-row on the real money product.
    import duckdb

    from rnadam_spark.functions.rounding import MONEY_DECIMAL

    li = load_table(spark, sf_dir, "lineitem")
    expr = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast(MONEY_DECIMAL)
    got = {
        (r.l_orderkey, r.l_linenumber): r.d
        for r in li.select(
            "l_orderkey", "l_linenumber", expr.cast("string").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = {
        (a, b): c
        for a, b, c in con.execute(
            f"""SELECT l_orderkey, l_linenumber,
                       CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                 AS {MONEY_DECIMAL}) AS VARCHAR)
                FROM lineitem"""
        ).fetchall()
    }
    assert got == want and len(got) > 0
