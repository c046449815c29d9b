"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect). A warmup action amortizes JVM/codegen startup out
of the measurements.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rnadam_spark.registry import QUERIES, load_all
from rnadam_spark.session import get_spark

# Headline set: the reference's hot path (k-mer count → classes), the
# EM building blocks, representative relational shapes, and the
# training-data pipeline operators.
HEADLINE = [
    "kmer_count",
    "equivalence_classes",
    "class_counts_normalized",
    "pricing_summary",
    "top_revenue_orders",
    "local_supplier_volume",
    "fraction_of_group",
    "sessionize_events",
    "asof_purchase_view",
    "hourly_event_rollup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_16",
    "embedding_topk",
    "embedding_bucket_pairs",
    "quality_scores",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("rnadam-bench")

    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # Warm the JVM/codegen/parquet-footer paths the headline set uses by
    # running the same queries once at the smallest scale factor; the
    # measured loop below then reflects steady-state per-query cost
    # instead of charging one-time session startup to whichever query
    # happens to run first.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warmup must never fail the bench

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
