"""Distinct-count roll-ups: exact via bitmap buckets, approximate via HLL.

``count(distinct x)`` is the classic scale trap: Spark expands it to a
two-exchange plan whose first shuffle carries every distinct RAW value
per group. For integer-keyed columns (user ids, part keys, doc ids)
the same answer — EXACT, not approximate — comes from a two-level
bitmap roll-up (Spark's ``bitmap_*`` family, the engine-native form of
a roaring-bitmap distinct):

1. each value maps to a (bucket, bit) pair — ``bitmap_bucket_number``
   / ``bitmap_bit_position`` slice the integer domain into 32768-bit
   (4096-byte) buckets;
2. ``bitmap_construct_agg`` per (group, bucket) — partial-aggregates
   map-side, so the shuffle carries at most one <=4 KB bitmap per
   (group, bucket) per map task, never the raw values;
3. ``sum(bitmap_count(...))`` per group collapses bucket cardinalities
   to the exact distinct count.

A group with 10^9 distinct members shuffles ~30k bitmap rows
(10^9 / 32768) of <=4 KB — ~122 MB spread across reducers by bucket
— where count(distinct) would shuffle 10^9 raw rows into one reducer's
group. The bucket key also rides the shuffle hash, so a hot group
spreads over reducers instead of funneling (the same skew argument as
``operators/guards.py``).

Bitmaps are only the exact path; when 2% error is acceptable,
``approx_distinct`` (HyperLogLog++, constant ~kilobytes per group at
ANY cardinality) is the cheaper sketch — both are exposed so callers
choose the trade explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_counts_bitmap(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-group ``count(distinct value_col)`` for a non-negative
    integer column via the two-level bitmap roll-up (module docstring).

    Output matches ``groupBy(...).agg(countDistinct(value_col))``
    row-for-row (pinned by test + DuckDB oracle), INCLUDING groups
    whose values are all NULL (count 0): null rows ride through the
    groupBy with a null (bucket, pos) — ``bitmap_construct_agg``
    skips them, and ``coalesce(bitmap_count(...), 0)`` turns the
    empty/null bitmap into 0 instead of dropping the group, the way a
    pre-filter would. Negative values raise (bitmap bit positions are
    defined on the non-negative domain); NULL values are ignored
    within a group, matching count(distinct) semantics."""
    group_cols = list(group_cols)
    v = F.col(value_col)
    checked = F.when(v < 0, F.raise_error(F.lit(f"{value_col} must be non-negative"))).otherwise(v)
    coded = df.select(
        *group_cols,
        F.bitmap_bucket_number(checked).alias("_bucket"),
        F.bitmap_bit_position(checked).alias("_pos"),
    )
    per_bucket = coded.groupBy(*group_cols, "_bucket").agg(
        F.bitmap_construct_agg(F.col("_pos")).alias("_bm")
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.sum(F.coalesce(F.bitmap_count(F.col("_bm")), F.lit(0)))
        .cast("bigint")
        .alias(out_col)
    )


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.02,
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Per-group HyperLogLog++ distinct estimate — the constant-memory
    sketch for any value type, when ``rsd`` relative error is an
    acceptable trade against the exact bitmap path's per-cardinality
    memory."""
    return df.groupBy(*list(group_cols)).agg(
        F.approx_count_distinct(value_col, rsd).cast("bigint").alias(out_col)
    )
