"""Per-row value counting and group-by-count — zero-shuffle analogs of
the reference's per-container aggregations.

The reference computes per-(transcript, kmer) counts and equivalence
classes with two shuffles (``reduceByKey`` then ``groupByKey``,
rice-core/.../algorithms/Index.scala:90-98). But both groupings are
keyed by the container first — every k-mer of a document lives in the
same input row — so the whole computation is a function of one row and
can run *inside* it: sort the shingle array, run-length count it, then
group the (value, cnt) pairs by cnt. No shuffle at all; the work
distributes with the scan. At 100 TB this turns the hottest pipeline
stage from two full-data shuffles into an embarrassingly parallel map.

Implementation notes:
- Intermediates (sorted array, run starts) MUST be bound as
  higher-order-function lambda variables (``let_``), not as aliased
  projection columns. Catalyst collapses projections under a Generate
  (explode) and inlines the defining expression into every reference;
  with the sorted array inlined into each ``element_at`` the per-row
  cost goes from O(n log n) to O(n^3) — observed as a hang at 500
  rows. A lambda variable is evaluated once per invocation and can
  never be inlined by the optimizer.
- ``F.sequence(1, n)`` with n = 0 yields the DESCENDING sequence
  [1, 0]; every sequence is guarded with ``when(n >= 1, ...)``.
- ANSI mode: ``element_at(arr, 0)`` throws, so the previous-element
  probe uses ``greatest(i - 1, 1)`` (the i = 1 case is decided by the
  OR's left side either way).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let_(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``expr`` once as a lambda variable visible to ``body``.

    ``transform(array(e), v -> body(v))[1]`` — the array argument is
    evaluated exactly once per invocation and ``v`` is a
    NamedLambdaVariable, so downstream optimizer rules cannot inline
    ``e`` into each of ``body``'s references. Use for any non-cheap
    intermediate referenced more than once inside a single expression.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


def _empty(element_type: str) -> Column:
    return F.array().cast(f"array<{element_type}>")


def value_counts(src: Column) -> Column:
    """``ARRAY<STRUCT<value STRING, cnt BIGINT>>``: the distinct values
    of the ``src`` string-array column with their multiplicities,
    ordered by value (run-length over the sorted array). O(n log n)
    per row, all JVM-side."""

    def with_arr(arr: Column) -> Column:
        n = F.size(arr)
        starts_expr = F.when(
            n >= 1,
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (i == 1)
                | (F.element_at(arr, i) != F.element_at(arr, F.greatest(i - 1, F.lit(1)))),
            ),
        ).otherwise(_empty("int"))

        def with_starts(starts: Column) -> Column:
            m = F.size(starts)
            return F.when(
                m >= 1,
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda j: F.struct(
                        F.element_at(arr, F.element_at(starts, j)).alias("value"),
                        (
                            F.when(j < m, F.element_at(starts, j + 1)).otherwise(n + 1)
                            - F.element_at(starts, j)
                        )
                        .cast("long")
                        .alias("cnt"),
                    ),
                ),
            ).otherwise(_empty("struct<value:string,cnt:bigint>"))

        return let_(starts_expr, with_starts)

    return let_(F.sort_array(src), with_arr)


def with_value_counts(df: DataFrame, src: Column, out: str) -> DataFrame:
    """Append ``out`` = ``value_counts(src)``."""
    return df.withColumn(out, value_counts(src))


def count_classes(vc: Column) -> Column:
    """Group a value-counts array by ``cnt``: equivalence classes of the
    reference's Index (k-mers sharing a multiplicity, Index.scala:95-98)
    as ARRAY<STRUCT<cnt BIGINT, class_id STRING, n_kmers BIGINT>>.

    ``class_id`` is the md5 of the '|'-joined members (already sorted,
    since value-counts preserves sorted order) — the deterministic
    replacement for ``zipWithUniqueId`` (SURVEY.md A4). The pass over
    distinct counts is O(#distinct_cnt × n) per row; multiplicity
    profiles are near-constant, so effectively linear.
    """

    def body(v: Column) -> Column:
        cnts = F.array_distinct(F.transform(v, lambda x: x["cnt"]))
        return F.transform(
            cnts,
            lambda c: let_(
                F.filter(v, lambda x: x["cnt"] == c),
                lambda members: F.struct(
                    c.cast("long").alias("cnt"),
                    F.md5(
                        F.array_join(F.transform(members, lambda x: x["value"]), "|")
                    ).alias("class_id"),
                    F.size(members).cast("long").alias("n_kmers"),
                ),
            ),
        )

    return let_(vc, body)
