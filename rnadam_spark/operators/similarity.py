"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; random-projection
LSH bucketing is the scale path (SURVEY.md §2.7 north star): at 100 TB
the all-pairs comparison is quadratic, while the bucketed variant costs
one projection pass + a self-join whose fan-out is bounded by bucket
occupancy. Hyperplanes are deterministic ±1 patterns (seeded), inlined
as literals in both the Spark plan and the oracle SQL.

Scale guards (both are load-bearing at 100 TB, not knobs):

- the plane count must GROW with the corpus — with p planes there are
  only 2^p buckets, so expected occupancy is N/2^p and the candidate
  self-join costs ~N²/2^p pairs. ``planes_for(n, target_bucket)`` gives
  the sizing rule: p ≥ log₂(N / target occupancy). A fixed p is only
  acceptable at a fixed N.
- even a well-sized p leaves skewed buckets (near-duplicate embedding
  farms, zero vectors); ``max_bucket`` on ``bucket_near_pairs`` drops
  those buckets outright — a bucket of n emits n² pairs, so one hot
  bucket can dominate the whole job. Same guard as
  ``dedup.lsh_candidate_pairs``.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64


def planes_for(n_vectors: int, target_bucket: int = 64) -> int:
    """Plane count so expected bucket occupancy ≈ ``target_bucket``:
    p = ceil(log₂(n / target)). 10⁹ vectors / target 64 → 24 planes."""
    return max(1, math.ceil(math.log2(max(n_vectors, 2) / max(target_bucket, 1))))


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


def lsh_buckets(
    embeddings: DataFrame, seed: int = 99, dim: int = DIM, n_planes: int = N_PLANES
) -> DataFrame:
    """(vec_id, bucket): bucket = bit pattern of sign(v · hᵢ). ``dim``
    must match the embedding width (zip_with null-pads otherwise);
    ``n_planes`` must be sized for the corpus — see ``planes_for``."""
    planes = hyperplanes(n=n_planes, dim=dim, seed=seed)
    emb = _as_double("embedding")
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(emb, lit_plane) >= 0).cast("int")
        bucket = bucket + bit * (2**j)
    return embeddings.select("vec_id", bucket.cast("bigint").alias("bucket"))


def _centroid_scores(emb: Column, centroids: list[list[int]]) -> Column:
    """ARRAY<STRUCT<s,cid>> of dot products against every centroid; the
    array_max of this is the argmax cell (struct ordering compares s
    first, then cid — ties break to the larger cid, mirrored in the
    oracle SQL's ORDER BY s DESC, cid DESC)."""
    return F.array(
        *[
            F.struct(
                dot(emb, F.array(*[F.lit(float(v)) for v in c])).alias("s"),
                F.lit(cid).alias("cid"),
            )
            for cid, c in enumerate(centroids)
        ]
    )


def ivf_cells(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 1234,
    dim: int = DIM,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cell): IVF coarse quantization — assign each vector to
    its nearest centroid. Default centroids are deterministic ±1
    patterns (equal norms, so dot-argmax ≡ cosine-argmax); pass
    ``centroids`` (e.g. from :func:`kmeans_centroids`) for trained
    cells. Assignment is a per-row projection against broadcast
    literals — zero shuffle, scan-speed. At scale the corpus is written
    partitioned/bucketed BY cell so a probe reads only its cells'
    files."""
    cents = centroids if centroids is not None else hyperplanes(n=n_centroids, dim=dim, seed=seed)
    cell = F.array_max(_centroid_scores(_as_double("embedding"), cents))["cid"]
    return embeddings.select("vec_id", cell.cast("bigint").alias("cell"))


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    max_iterations: int = 5,
    dim: int = DIM,
) -> list[list[float]]:
    """Train IVF centroids with Lloyd's iterations, DataFrame-native.

    Init is a deterministic hash-sample: the ``k`` vectors with the
    smallest ``xxhash64(vec_id)`` (one TakeOrdered job — partitioning-
    independent, so training is reproducible on any layout). Each
    iteration then costs:

    - assignment: per-row dot-argmax against the current centroids as
      broadcast literals (the exact ``ivf_cells`` expression) — zero
      shuffle;
    - update: ``posexplode`` the assigned vectors to (cell, dim, value)
      and average per (cell, dim) — ONE shuffle whose final state is
      k·dim scalars. Those come back to the driver to become the next
      iteration's literals: driver state is bounded by k·dim regardless
      of corpus size (the same loop-state shape Spark MLlib's KMeans
      uses — centroids are genuinely small dimension data, not a
      collect() of the corpus).

    Empty cells keep their previous centroid. Returns the centroid list
    for ``ivf_cells(..., centroids=...)`` / ``ivf_topk``. Means (not
    normalized) — pair with dot-argmax assignment on roughly
    unit-normalized embeddings, or normalize downstream."""
    init = (
        embeddings.select(_as_double("embedding").alias("e"), F.xxhash64("vec_id").alias("h"))
        .orderBy("h", "e")
        .limit(k)
        .collect()
    )
    cents: list[list[float]] = [list(r.e) for r in init]
    for _ in range(max_iterations):
        cell = F.array_max(_centroid_scores(_as_double("embedding"), cents))["cid"]
        assigned = embeddings.select(cell.alias("cell"), _as_double("embedding").alias("e"))
        means = (
            assigned.select("cell", F.posexplode("e").alias("d", "v"))
            .groupBy("cell", "d")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cells keep position
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.d] = r.m
        for cid, dims in by_cell.items():
            new_cents[cid] = [dims[i] for i in range(len(dims))]
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 1234,
    dim: int = DIM,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cos): approximate top-k — score only vectors whose IVF
    cell is among the query's ``n_probe`` nearest cells (the standard
    IVF trade: ~n_probe/n_centroids of the corpus scored instead of all
    of it; recall grows with n_probe). Complements the LSH-bucket path:
    IVF gives tunable recall at query time, LSH gives join-free
    all-pairs candidate generation. ``centroids`` (e.g. from
    :func:`kmeans_centroids`) replaces the default ±1 patterns."""
    cents = centroids if centroids is not None else hyperplanes(n=n_centroids, dim=dim, seed=seed)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _as_double("embedding").alias("q_emb")
    )
    probes = (
        q.select(F.explode(_centroid_scores(F.col("q_emb"), cents)).alias("sc"))
        .orderBy(F.col("sc.s").desc(), F.col("sc.cid").desc())
        .limit(n_probe)
        .select(F.col("sc.cid").cast("bigint").alias("cell"))
    )
    cell = F.array_max(_centroid_scores(_as_double("embedding"), cents))["cid"]
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .withColumn("cell", cell.cast("bigint"))
        .join(F.broadcast(probes), "cell")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine(_as_double("embedding"), F.col("q_emb")).alias("cos_raw"),
        )
    )
    return (
        scored.select(
            "vec_id", (F.floor(F.col("cos_raw") * 1e6 + F.lit(0.5)) / 1e6).alias("cos")
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )


def bucket_near_pairs(
    embeddings: DataFrame,
    min_cos: float = 0.0,
    seed: int = 99,
    dim: int = DIM,
    n_planes: int = N_PLANES,
    max_bucket: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cos): cosine for pairs sharing an LSH bucket —
    the ANN candidate verification step. ``max_bucket`` drops buckets
    larger than the cap before the self-join (a bucket of n emits n²
    pairs); the windowed count shares the join's (bucket) partitioning,
    so the guard adds no extra exchange."""
    with_bucket = lsh_buckets(embeddings, seed, dim, n_planes).join(embeddings, "vec_id")
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        with_bucket = (
            with_bucket.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
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
