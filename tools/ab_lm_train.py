"""Interleaved A/B of train_char_lm kernels (r13): Counter-partial
pandas vs JVM explode+hashagg, min-of-3 through the noop sink at the
given data dir. Also captures the training plan for plans/r13."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rnadam_spark.operators import lm as lmod
from rnadam_spark.session import get_spark
from rnadam_spark.sources.tables import load_table


def timed(spark, make_df, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents", widen=True)
    train_src = docs.filter(F.col("doc_id") % 10 == 0)
    # warmup
    train_src.limit(10).write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("ab lm_train pandas")
    p = timed(spark, lambda: lmod.train_char_lm(train_src, cache=False))
    spark.sparkContext.setJobDescription("ab lm_train jvm")
    j = timed(spark, lambda: lmod.train_char_lm(train_src, cache=False, kernel="jvm"))
    spark.sparkContext.setJobDescription("ab lm_train pandas 2")
    p2 = timed(spark, lambda: lmod.train_char_lm(train_src, cache=False))
    spark.sparkContext.setJobDescription(None)
    print(f"{sf_dir}: pandas={p} jvm={j} pandas_rerun={p2}")

    if len(sys.argv) > 2 and sys.argv[2] == "--plans":
        for name, kern in (("lm_train_before", "jvm"), ("lm_train_after", "pandas")):
            df = lmod.train_char_lm(train_src, cache=False, kernel=kern)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"/root/repo/plans/r13/{name}.txt", "w") as f:
                f.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
