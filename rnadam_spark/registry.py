"""Central query registry — the driver-facing surface.

Every implemented operator from SURVEY.md §2 (and the training-data
pipeline extensions) registers here as a named query over the driver's
parquet tables, optionally paired with an ANSI-SQL oracle that DuckDB
runs on the same data. ``__spark_entry__.py`` re-exports this registry.

Contract (see __spark_entry__ docstring): the driver compares the Spark
result and the oracle result by row count + schema + order-insensitive
value hash, so every computed column is aliased identically on both
sides, and floating-point aggregates are rounded on both sides so the
two engines' summation orders cannot produce hash-different bits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, with optional
    DuckDB oracle SQL. Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    import rnadam_spark.queries  # noqa: F401
