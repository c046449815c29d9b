"""Token-budget mixture sampling (operators/mixing.py): plan math,
selection determinism, upsampling copies, python-reference agreement,
and realized-token tolerance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rnadam_spark.functions.hashing import MOD, hash_family
from rnadam_spark.operators import mixing


def _docs(spark, n=400):
    # three sources with very different sizes: web is huge, code mid,
    # books tiny (the shape that forces both down- and up-sampling)
    rows = []
    for i in range(n):
        src = "web" if i % 4 != 3 else ("code" if i % 8 == 3 else "books")
        rows.append((i, f"doc {i} text", src, 100 + (i % 7) * 10))
    return spark.createDataFrame(rows, ["doc_id", "text", "source", "n_chars"])


def test_source_token_budgets_math(spark):
    docs = _docs(spark)
    shares = {"web": 0.5, "books": 0.3}  # code unlisted -> rate 0
    plan = {r.source: r for r in mixing.source_token_budgets(docs, shares, 10_000).collect()}
    totals = {
        r.source: r.t
        for r in docs.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    assert plan["web"].available_tokens == totals["web"]
    assert plan["web"].target_tokens == pytest.approx(5_000)
    assert plan["web"].rate == pytest.approx(5_000 / totals["web"])
    assert plan["books"].rate == pytest.approx(3_000 / totals["books"])
    assert plan["code"].share == 0.0 and plan["code"].rate == 0.0


def _py_reference(rows, shares, budget, seed=41):
    import math

    totals: dict[str, int] = {}
    for _i, _t, src, nc in rows:
        totals[src] = totals.get(src, 0) + nc
    rates = {s: shares.get(s, 0.0) * budget / totals[s] for s in totals}
    a, b = hash_family(1, seed)[0]
    out = {}
    for i, _t, src, _nc in rows:
        r = rates[src]
        whole = math.floor(r)
        code = ((i % MOD + MOD) % MOD * a + b) % MOD
        n = whole + (1 if code < int((r - whole) * MOD) else 0)
        if n > 0:
            out[i] = n
    return out


def test_mixture_sample_matches_python_reference_and_is_deterministic(spark):
    docs = _docs(spark)
    shares = {"web": 0.2, "books": 0.4}  # books is tiny -> rate > 1
    budget = 20_000
    got = (
        mixing.mixture_sample(docs, shares, budget)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("n_copy").alias("mx"))
        .collect()
    )
    counts = {r.doc_id: r.n for r in got}
    # n_copy is a dense 0-based index per doc
    assert all(r.mx == r.n - 1 for r in got)
    assert counts == _py_reference(
        [(r.doc_id, r.text, r.source, r.n_chars) for r in docs.collect()],
        shares,
        budget,
    )
    # repartitioning must not change the selected multiset
    counts2 = {
        r.doc_id: r.n
        for r in mixing.mixture_sample(docs.repartition(13), shares, budget)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts2 == counts


def test_mixture_sample_upsamples_and_hits_budgets(spark):
    docs = _docs(spark, n=2000)
    shares = {"web": 0.3, "books": 0.5, "code": 0.2}
    budget = 150_000
    out = mixing.mixture_sample(docs, shares, budget)
    realized = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    for src, share in shares.items():
        target = share * budget
        assert realized[src] == pytest.approx(target, rel=0.15), src
    # books is far smaller than its share: repeats must exist
    assert out.filter((F.col("source") == "books") & (F.col("n_copy") > 0)).count() > 0
    # and repeats are exact copies distinguishable by n_copy
    dup = out.filter(F.col("source") == "books").groupBy("doc_id", "n_copy").count()
    assert dup.filter(F.col("count") > 1).count() == 0


def test_mixture_sample_drops_unlisted_sources_and_plans_clean(spark):
    docs = _docs(spark)
    out = mixing.mixture_sample(docs, {"books": 1.0}, 5_000)
    assert out.filter(F.col("source") != "books").count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # broadcast-CASE + explode, never a window


def test_mixture_selection_cross_checked_in_duckdb(spark):
    """The same affine-mod arithmetic re-derived in DuckDB selects the
    identical (doc_id, n_copy) multiset — the oracle shape a future
    gate rotation would register."""
    from rnadam_spark.operators.sampling import sample_code_sql

    docs = _docs(spark)
    shares = {"web": 0.2, "books": 0.4}
    budget = 20_000
    got = sorted(
        (r.doc_id, r.n_copy)
        for r in mixing.mixture_sample(docs, shares, budget).select("doc_id", "n_copy").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, source VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(r.doc_id, r.source, r.n_chars) for r in docs.collect()],
    )
    share_case = (
        "CASE source WHEN 'web' THEN 0.2 WHEN 'books' THEN 0.4 ELSE 0.0 END"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        WITH totals AS (
          SELECT source, sum(n_chars)::DOUBLE AS avail FROM docs GROUP BY source),
        rated AS (
          SELECT d.doc_id, ({share_case}) * {budget} / t.avail AS rate
          FROM docs d JOIN totals t USING (source)),
        n AS (
          SELECT doc_id,
                 CAST(floor(rate) AS BIGINT)
                 + CASE WHEN ({sample_code_sql('doc_id', 41)})
                        < CAST((rate - floor(rate)) * {MOD} AS BIGINT)
                        THEN 1 ELSE 0 END AS n_copies
          FROM rated)
        SELECT doc_id, unnest(range(n_copies)) AS n_copy FROM n WHERE n_copies > 0
        """
            ).fetchall(),
        )
    )
    assert got == want and got
