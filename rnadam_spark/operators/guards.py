"""Skew-safe bucket-size guards for pair-generating self-joins.

Every candidate-pair operator in this engine (LSH bands, SimHash/dHash
pigeonhole bands, k-means cells, n-gram document frequency) bounds its
quadratic blow-up by dropping buckets above a size cap. The WRONG way
to enforce the cap is ``Window.partitionBy(bucket).count()``: a window
count has no map-side partial aggregation and AQE cannot skew-split a
window the way it splits a join, so the 10⁶-member boilerplate bucket
the cap exists for funnels into ONE task at the guard itself — the
exact hot spot the guard is supposed to prevent.

The right form, used everywhere via :func:`drop_oversize_buckets`:

1. ``groupBy(bucket).count()`` — map-side partial aggregation means the
   shuffle carries one (bucket, partial-count) row per task per bucket,
   never the bucket's member rows;
2. keep only the OVERSIZE buckets — by construction a tiny set (each
   one holds > cap rows, so there are at most |input| / cap of them);
3. broadcast LEFT ANTI join — the big side never shuffles for the
   guard, every executor just drops rows whose key is in the tiny
   broadcast set.

Cost: the guarded subtree is evaluated twice (once for the count, once
for the join probe) — two cheap projection scans in exchange for
removing the single-task hot spot. The caller can materialize the
subtree first if it is expensive (the span/curate stage-boundary
discipline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_oversize_buckets(
    df: DataFrame, keys: Sequence[str], max_bucket: int
) -> DataFrame:
    """Drop every row belonging to a ``keys``-group with more than
    ``max_bucket`` rows, without ever funneling a hot group into one
    task: aggregate-then-broadcast-anti-join (see module docstring).

    Output rows are exactly those the windowed-count form would keep —
    the oracle-facing semantics are unchanged — but the plan contains
    no Window operator (pinned by ``tests/test_plans.py``)."""
    keys = list(keys)
    oversize = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select(*keys)
    )
    # re-select the input's column order: the equi-join would otherwise
    # move the join keys first, silently reordering the caller's schema
    return df.join(F.broadcast(oversize), keys, "left_anti").select(*df.columns)
