"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; random-projection
LSH bucketing is the scale path (SURVEY.md §2.7 north star): at 100 TB
the all-pairs comparison is quadratic, while the bucketed variant costs
one projection pass + a self-join whose fan-out is bounded by bucket
occupancy. Hyperplanes are deterministic ±1 patterns (seeded), inlined
as literals in both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64


def hyperplanes(n: int = N_PLANES, dim: int = DIM, seed: int = 99) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for sign-random-projection LSH."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n)]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    na = F.sqrt(dot(a, a))
    nb = F.sqrt(dot(b, b))
    return dot(a, b) / (na * nb)


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 20
) -> DataFrame:
    """(vec_id, cos): exact top-k by cosine against one query vector.

    The query row is a broadcast 1-row dimension; the scan side stays
    partitioned, score is a per-row projection, and only the global
    top-k ordering reduces — Spark's TakeOrdered handles that without a
    full sort of the corpus."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _as_double("embedding").alias("q_emb")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine(_as_double("embedding"), F.col("q_emb")).alias("cos_raw"),
        )
    )
    return (
        scored.select("vec_id", (F.floor(F.col("cos_raw") * 1e6 + F.lit(0.5)) / 1e6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )


def lsh_buckets(embeddings: DataFrame, seed: int = 99, dim: int = DIM) -> DataFrame:
    """(vec_id, bucket): bucket = bit pattern of sign(v · hᵢ). ``dim``
    must match the embedding width (zip_with null-pads otherwise)."""
    planes = hyperplanes(dim=dim, seed=seed)
    emb = _as_double("embedding")
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(emb, lit_plane) >= 0).cast("int")
        bucket = bucket + bit * (2**j)
    return embeddings.select("vec_id", bucket.cast("bigint").alias("bucket"))


def bucket_near_pairs(
    embeddings: DataFrame, min_cos: float = 0.0, seed: int = 99, dim: int = DIM
) -> DataFrame:
    """(vec_a, vec_b, cos): cosine for pairs sharing an LSH bucket —
    the ANN candidate verification step."""
    with_bucket = lsh_buckets(embeddings, seed, dim).join(embeddings, "vec_id")
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                F.floor(
                    cosine(_as_double(F.col("a.embedding")), _as_double(F.col("b.embedding")))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
    )
