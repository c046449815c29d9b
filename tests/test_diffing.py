"""Corpus snapshot diff (operators/diffing.py)."""

from __future__ import annotations

from rnadam_spark.operators.diffing import corpus_diff, diff_summary


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma EDITED"), (4, "delta")], "doc_id bigint, text string"
    )
    diff = corpus_diff(old, new)
    got = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    assert diff_summary(diff) == {
        "added": 1, "removed": 1, "changed": 1, "unchanged": 1
    }


def test_corpus_diff_join_carries_only_hashes(spark):
    old = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    new = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    plan = corpus_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    # document text never crosses the join — only ids and md5 hashes
    assert "_h_old" in plan and "text" not in plan.split("Join")[0]
