"""Deterministic, leakage-safe train/validation/test splits.

Splitting a training corpus uniformly at random leaks: near-duplicate
documents land on both sides of the train/eval boundary, and the eval
loss silently measures memorization (the same failure benchmark
decontamination guards against, ``text.contamination_scores`` /
``spans.contaminated_spans``, but internal to the corpus itself). The
fix is to split by DUPLICATE CLUSTER, not by document — every member of
a near-dup cluster gets the cluster's verdict, so no pair of near-dups
ever straddles a split.

Composition, all existing machinery:

1. near-dup pairs (``dedup.lsh_candidate_pairs`` → ``verify_pairs``, or
   any other pair operator) → ``clustering.connected_components`` gives
   each paired doc a canonical cluster id;
2. singleton docs (never in any pair) are their own cluster
   (``coalesce(component, doc_id)``);
3. the split verdict is a pure hash of the cluster id
   (``sampling._sample_code``) cut by cumulative fractions — the same
   deterministic membership argument as ``hash_sample``: same corpus →
   same split on any partitioning, any cluster layout, either engine.

Scale: the component mapping covers only docs that appear in a pair —
at real dup rates a small fraction of the corpus — and joins the corpus
once on doc_id (AQE broadcasts it when small). The verdict itself is a
projection: zero additional shuffles, pushdown-friendly, and a split
can be re-derived for any single document without touching the rest of
the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.hashing import MOD
from rnadam_spark.operators.clustering import connected_components
from rnadam_spark.operators.sampling import _sample_code


def split_column(key: Column | str, fractions: dict[str, float], seed: int = 23) -> Column:
    """Split-name Column from a deterministic hash of ``key`` cut by
    cumulative ``fractions`` (insertion order). Fractions must sum to
    ~1; hash values beyond the last boundary (float rounding) fall into
    the last split, so every row is assigned."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    code = _sample_code(key, seed)
    names = list(fractions)
    expr = F.lit(names[-1])  # remainder → last split
    cum = 0.0
    boundaries = []
    for name, frac in fractions.items():
        cum += frac
        boundaries.append((name, int(cum * MOD)))
    # build innermost-out so evaluation checks boundaries in order
    for name, bound in reversed(boundaries[:-1]):
        expr = F.when(code < bound, F.lit(name)).otherwise(expr)
    return expr


def assign_split(
    df: DataFrame,
    key: Column | str,
    fractions: dict[str, float],
    seed: int = 23,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column keyed on ``key`` — the plain
    (leakage-unaware) form; use :func:`leakage_safe_split` when a
    near-dup pair set exists."""
    return df.withColumn(out_col, split_column(key, fractions, seed))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 23,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, group_id, split): train/val/test assignment where every
    near-dup cluster lands whole in one split. ``pairs`` is any
    near-dup pair table (verified candidates); ``group_id`` is the
    cluster canonical id (min doc id of the component; a doc in no pair
    is its own group). Join back to the corpus on ``doc_id`` to
    materialize per-split text.

    Guarantee: for every (a, b) in ``pairs``, a and b (and anything
    transitively linked) have equal ``group_id`` and hence equal
    ``split`` — the hash sees only the group id."""
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    cc = connected_components(pairs, src, dst, checkpoint_dir=checkpoint_dir)
    assigned = (
        docs.select(id_col)
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
        )
    )
    return assigned.withColumn("split", split_column(F.col("group_id"), fractions, seed))
