"""Deterministic, dialect-portable hashing.

The reference numbered equivalence classes with ``zipWithUniqueId``
(rice-core/.../algorithms/Index.scala:98, SURVEY.md A4) — partition-order
dependent, nondeterministic across cluster layouts. At 100 TB that means
two runs of the same index disagree. We replace every ID assignment with
content hashing, and — because the correctness oracle re-runs our queries
in DuckDB — the hash functions here are chosen to be computable with
*identical integer results* in both engines (portable SQL: ``ascii`` /
``substring`` / ``%`` on BIGINT only).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # prime; keeps a*code + b within BIGINT
BASE = 31


def poly_hash_sql(expr: str, k: int, base: int = BASE, mod: int = MOD) -> str:
    """Portable SQL for a base-``base`` polynomial rolling hash of the
    first ``k`` chars of ``expr``. Unrolled (k is small and fixed) so the
    exact same text parses in Spark SQL and DuckDB and produces the same
    BIGINT. Each step stays < 31*mod + 255, well inside BIGINT range.
    """
    acc = f"CAST(ascii(substring({expr}, 1, 1)) AS BIGINT)"
    for i in range(2, k + 1):
        acc = f"(({acc}) * {base} + ascii(substring({expr}, {i}, 1))) % {mod}"
    return acc


def poly_hash_col(col: Column | str, k: int, base: int = BASE, mod: int = MOD) -> Column:
    """Column-API equivalent of :func:`poly_hash_sql` (same values)."""
    c = F.col(col) if isinstance(col, str) else col
    acc = F.ascii(c.substr(1, 1)).cast("bigint")
    for i in range(2, k + 1):
        acc = (acc * base + F.ascii(c.substr(i, 1))) % mod
    return acc


def hash_family(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """``n`` universal-hash coefficient pairs (a, b), deterministic in
    ``seed`` — baked into both the Spark plan and the oracle SQL so
    MinHash signatures agree bit-for-bit across engines and runs.
    """
    rng = random.Random(seed)
    return [(rng.randrange(1, MOD), rng.randrange(0, MOD)) for _ in range(n)]


def affine_sql(code_expr: str, a: int, b: int, mod: int = MOD) -> str:
    return f"(({code_expr}) * {a} + {b}) % {mod}"


def affine_col(code: Column, a: int, b: int, mod: int = MOD) -> Column:
    return (code * F.lit(a) + F.lit(b)) % F.lit(mod)
