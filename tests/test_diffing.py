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


def test_vocabulary_shift_matches_python_js(spark):
    import math
    from collections import Counter

    old_rows = [(1, "apple banana apple"), (2, "cherry banana")]
    new_rows = [(1, "apple spam spam"), (2, "spam banana spam")]
    old = spark.createDataFrame(old_rows, "doc_id bigint, text string")
    new = spark.createDataFrame(new_rows, "doc_id bigint, text string")
    from rnadam_spark.operators.diffing import vocabulary_shift

    out = vocabulary_shift(old, new, top_k=None)
    got = {r["token"]: r for r in out.collect()}

    co = Counter(t for _, s in old_rows for t in s.split())
    cn = Counter(t for _, s in new_rows for t in s.split())
    to, tn = sum(co.values()), sum(cn.values())
    js_total = 0.0
    for tok in set(co) | set(cn):
        p, q = co[tok] / to, cn[tok] / tn
        m = (p + q) / 2
        contrib = (0.5 * p * math.log(p / m) if p else 0.0) + (
            0.5 * q * math.log(q / m) if q else 0.0
        )
        js_total += contrib
        assert abs(got[tok]["p_old"] - p) < 1e-12
        assert abs(got[tok]["p_new"] - q) < 1e-12
        assert abs(got[tok]["js_contribution"] - contrib) < 1e-12, tok
    spark_total = sum(r["js_contribution"] for r in got.values())
    assert abs(spark_total - js_total) < 1e-12
    # 'spam' is the biggest mover
    top = vocabulary_shift(old, new, top_k=1).collect()[0]
    assert top["token"] == "spam"


def test_vocabulary_shift_identical_corpora_zero(spark):
    from rnadam_spark.operators.diffing import vocabulary_shift

    df = spark.createDataFrame([(1, "same words here")], "doc_id bigint, text string")
    rows = vocabulary_shift(df, df, top_k=None).collect()
    assert all(abs(r["js_contribution"]) < 1e-15 for r in rows)


def test_corpus_diff_null_text_is_changed(spark):
    old = spark.createDataFrame([(5, "x"), (6, None)], "doc_id bigint, text string")
    new = spark.createDataFrame([(5, None), (6, None)], "doc_id bigint, text string")
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {5: "changed", 6: "unchanged"}


def test_corpus_diff_matches_retired_oracle(spark, sf_dir):
    # gate rotation r11 retired the corpus_diff CORRECTNESS row (slot →
    # excise_paragraphs; the snapshot views live on in the registered
    # vocabulary_shift); its DuckDB oracle stays here so the md5
    # full-outer-join diff keeps a cross-engine check
    import os

    import duckdb

    from rnadam_spark.queries.pipeline_q import _CORPUS_DIFF_SQL, corpus_diff_docs

    got = sorted(
        (r.doc_id, r.status) for r in corpus_diff_docs(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_CORPUS_DIFF_SQL).fetchall()))
    assert got == want and got
    # every status class is actually exercised by the synthetic release
    assert {s for _, s in got} == {"added", "removed", "changed", "unchanged"}
