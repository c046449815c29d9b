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


def test_money_term_quantization_identical_across_engines(spark, sf_dir):
    # the money_sum contract (functions/rounding.py): per-term
    # q = floor(x·10⁶ + 0.5) is two IEEE ops both engines compute
    # identically on equal double bits, and the hi/lo split recombines
    # to q by construction. Pinned row-for-row on the real 3-factor
    # money product, plus the in-engine split identity.
    import duckdb

    from rnadam_spark.functions.rounding import MONEY_SCALE, _money_split

    li = load_table(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    hi, lo = _money_split(charge)
    rows = li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(charge * F.lit(float(MONEY_SCALE)) + F.lit(0.5)).alias("q"),
        (hi * F.lit(MONEY_SCALE) + lo).alias("recombined"),
    ).collect()
    assert all(r.q == r.recombined for r in rows)  # split identity
    got = {(r.l_orderkey, r.l_linenumber): r.q for r in rows}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = {
        (a, b): c
        for a, b, c in con.execute(
            f"""SELECT l_orderkey, l_linenumber,
                       CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                  * {MONEY_SCALE}.0 + 0.5) AS BIGINT)
                FROM lineitem"""
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_money_rounding_pairing_across_engines(spark):
    # the money_sum_rounded contract: half-up rounding happens in exact
    # integer arithmetic on the recombined DECIMAL(38,0) via pmod
    # (Spark pmod <-> DuckDB ((x%m)+m)%m — the probed-identical pair),
    # and only the ONE final scale-0 decimal converts to double. Pinned
    # on ties, near-ties, negatives, and a magnitude past 2^53 where
    # the old decimal(38,10)->double path provably diverged.
    import duckdb

    # scaled-integer sums (value·10⁶) at the d=4 rounding step 100
    cases = [
        "123000050",            # exact tie -> half-up to 123000100
        "-123000050",           # negative tie -> half-up (toward +inf)
        "123000049",            # just below
        "123000051",            # just above
        "417556465744910050",   # the sf10 one-ulp divergence magnitude
        "12345678901234567890123",  # past 2^53: conversion must agree
        "50",
        "-49",
    ]

    def spark_round(c: str) -> str:
        s = f"(CAST('{c}' AS DECIMAL(38,0)) + 50)"
        return f"CAST(({s} - pmod({s}, 100)) AS DOUBLE) / 1000000.0"

    def duck_round(c: str) -> str:
        s = f"(CAST('{c}' AS DECIMAL(38,0)) + 50)"
        return f"CAST(({s} - ((({s} % 100) + 100) % 100)) AS DOUBLE) / 1000000.0"

    got = [
        repr(v)
        for v in spark.sql(
            "SELECT " + ", ".join(f"{spark_round(c)} AS c{i}" for i, c in enumerate(cases))
        ).collect()[0]
    ]
    want = [
        repr(v)
        for v in duckdb.sql(
            "SELECT " + ", ".join(duck_round(c) for c in cases)
        ).fetchall()[0]
    ]
    assert got == want


def test_money_sum_exact_past_double_grain(spark):
    # sums past the old ~9x10^11 double-grain ceiling stay value-exact:
    # 24 rows of ~4.2x10^11 reach 10^13, where a double SUM's 4dp half-up
    # is no longer trustworthy, and the hi/lo split must still equal the
    # DuckDB twin bit-for-bit
    import duckdb

    from rnadam_spark.functions.rounding import money_sum_rounded, money_sum_rounded_sql

    vals = [417556465744.91005 + i * 1e9 for i in range(24)]
    sdf = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = sdf.agg(money_sum_rounded("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {money_sum_rounded_sql('x')} FROM t").fetchone()[0]
    assert repr(got) == repr(want)


def test_supplier_distinct_parts_matches_retired_oracle(spark, sf_dir):
    # gate rotation r12 retired the supplier_distinct_parts CORRECTNESS
    # row (slot → the native ingestion rows in ingest_q.py); the
    # count-distinct-per-group kernel stays gate-verified through
    # distinct_users_by_type, and this row keeps its direct
    # cross-engine check here
    import os

    import duckdb

    from rnadam_spark.queries.relational import (
        _SUPPLIER_PARTS_SQL,
        supplier_distinct_parts,
    )

    got = sorted(tuple(r) for r in supplier_distinct_parts(spark, sf_dir).collect())
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "lineitem.parquet")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_SUPPLIER_PARTS_SQL).fetchall()))
    assert got == want and len(got) > 0
