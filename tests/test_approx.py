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


def test_money_decimal_rounding_pairing_across_engines(spark):
    # the money_sum_rounded contract (functions/rounding.py): rounding
    # to 4dp happens in EXACT decimal on both sides, and the engine
    # pairing is Spark's downcast CAST (HALF_UP) <-> DuckDB's round()
    # (half away from zero) — DuckDB's own CAST truncates and must not
    # be used. Pinned on ties, near-ties, negatives, and a >2^53-
    # unscaled magnitude where double-path rounding provably diverges.
    import duckdb

    cases = [
        "123.0000500000",      # exact tie
        "-123.0000500000",     # negative tie (both round away from zero)
        "123.0000499999",      # just below
        "123.0000500001",      # just above
        "417556465744.9100500000",  # the sf10 one-ulp divergence case
        "0.0000500000",
        "-0.0000499999",
    ]
    sdf = spark.sql(
        "SELECT "
        + ", ".join(
            f"CAST(CAST('{c}' AS DECIMAL(38,10)) AS DECIMAL(38,4)) AS c{i}"
            for i, c in enumerate(cases)
        )
    )
    got = [str(v) for v in sdf.collect()[0]]
    want = [
        str(v)
        for v in duckdb.sql(
            "SELECT "
            + ", ".join(
                f"round(CAST('{c}' AS DECIMAL(38,10)), 4)" for c in cases
            )
        ).fetchall()[0]
    ]
    assert got == want
    # and the final decimal(38,4) -> double cast agrees bit-for-bit
    # while the unscaled value fits 2^53
    s2 = spark.sql(
        "SELECT CAST(CAST('417556465744.9101' AS DECIMAL(38,4)) AS DOUBLE)"
    ).collect()[0][0]
    d2 = duckdb.sql(
        "SELECT CAST(CAST('417556465744.9101' AS DECIMAL(38,4)) AS DOUBLE)"
    ).fetchall()[0][0]
    assert s2 == d2 and repr(s2) == repr(d2)
