"""drop_oversize_buckets (operators/guards.py): output-equivalence with
the window-count form it replaced, and the broadcast-anti-join shape."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from rnadam_spark.operators.guards import drop_oversize_buckets
from rnadam_spark.plans.checks import has_broadcast_join, has_window


def test_guard_matches_window_form(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 6), rng.randint(0, 2)) for i in range(300)]
    df = spark.createDataFrame(rows, "id BIGINT, b1 BIGINT, b2 BIGINT")
    for keys in (["b1"], ["b1", "b2"]):
        for cap in (1, 3, 10, 1000):
            got = sorted(map(tuple, drop_oversize_buckets(df, keys, cap).collect()))
            w = Window.partitionBy(*keys)
            want = sorted(
                map(
                    tuple,
                    df.withColumn("_n", F.count("*").over(w))
                    .filter(F.col("_n") <= cap)
                    .drop("_n")
                    .collect(),
                )
            )
            assert got == want, (keys, cap)


def test_guard_plan_shape(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(50)], "id BIGINT, b BIGINT")
    out = drop_oversize_buckets(df, ["b"], 7)
    assert not has_window(out)
    assert has_broadcast_join(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
