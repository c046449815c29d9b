"""Corpus snapshot diffing for dataset versioning.

Pre-training corpora are rebuilt from periodic snapshots (monthly
crawls, dataset releases); the expensive stages (signatures, embeddings,
LM scores) should re-run only for documents that actually changed. This
operator computes the per-document delta between two corpus versions so
downstream incremental stages (``dedup.incremental_near_dups``,
``similarity.incremental_semantic_dups``, the signature-store ``ingest``
CLI) can be fed exactly the added+changed slice.

Shape: content compares by md5 (the engine's exact-dedup hash), one
full-outer join on the document id — both sides hash-partition on the
same key, no skew beyond id collisions, and the projection before the
join carries only (id, hash), so the join never moves document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, status) for every document id in either snapshot:
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, different content hash), ``unchanged``. Feed
    ``.filter("status in ('added','changed')")`` joined back to the new
    snapshot into the incremental stages."""
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h_old"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h_new"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") == F.col("_h_new"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


def diff_summary(diff: DataFrame) -> dict[str, int]:
    """{status: count} from a :func:`corpus_diff` result — four scalars
    to the driver (the bounded-loop-state pattern), for release notes
    and monitoring."""
    rows = diff.groupBy("status").agg(F.count("*").alias("n")).collect()
    out = {s: 0 for s in ("added", "removed", "changed", "unchanged")}
    out.update({r["status"]: r["n"] for r in rows})
    return out
