"""Deterministic sampling + per-group quantile filter (operators/sampling.py)."""

from pyspark.sql import functions as F

from rnadam_spark.operators import sampling


def _keys(df):
    return {r[0] for r in df.collect()}


def test_hash_sample_partitioning_invariant(spark):
    # the property df.sample() lacks: identical membership on any layout
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = _keys(sampling.hash_sample(df, "k", 0.2, seed=5).select("k"))
    b = _keys(sampling.hash_sample(df.repartition(13), "k", 0.2, seed=5).select("k"))
    c = _keys(sampling.hash_sample(df.coalesce(1), "k", 0.2, seed=5).select("k"))
    assert a == b == c
    assert 0.16 * 5000 <= len(a) <= 0.24 * 5000


def test_hash_sample_seeds_independent(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = _keys(sampling.hash_sample(df, "k", 0.1, seed=1).select("k"))
    b = _keys(sampling.hash_sample(df, "k", 0.1, seed=2).select("k"))
    # expected overlap of independent 10% samples: ~1% of rows
    assert len(a & b) < 0.03 * 20000


def test_stratified_rates(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(10000)]
    df = spark.createDataFrame(rows, "k BIGINT, s STRING")
    got = sampling.stratified_hash_sample(
        df, "s", {"a": 0.5, "b": 0.05}, "k", default_fraction=0.0, seed=9
    )
    counts = {r.s: r.n for r in got.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 0.4 * 5000 <= counts["a"] <= 0.6 * 5000
    assert counts.get("b", 0) <= 0.1 * 5000


def test_stratified_default_drops_unlisted(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k BIGINT, s STRING")
    assert sampling.stratified_hash_sample(df, "s", {"x": 1.0}, "k").count() == 1


def test_top_fraction_golden(spark):
    # scores 1..8 in one group: top 25% by percent_rank = pr <= 0.25
    # -> ranks 1..2 of 8 (pr 0 and 1/7)
    rows = [(i, "g", float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    got = sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id")
    assert _keys(got.select("doc_id")) == {8, 7}


def test_top_fraction_threshold_golden(spark):
    # scores 1..8 in one group: the exact 75th-percentile threshold is
    # 1 + 0.75*7 = 6.25, so score >= 6.25 keeps {7, 8}
    rows = [(i, "g", float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    got = sampling.top_fraction_per_group_threshold(df, "src", "score", 0.25)
    assert _keys(got.select("doc_id")) == {8, 7}


def test_top_fraction_threshold_matches_rank_form(spark):
    # the broadcast-threshold form keeps the same set as the percent_rank
    # form up to boundary ties (which the threshold form keeps entirely)
    rows = [(i, f"s{i % 4}", float((i * 37) % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    rank = _keys(
        sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id").select("doc_id")
    )
    thr = _keys(
        sampling.top_fraction_per_group_threshold(df, "src", "score", 0.25).select("doc_id")
    )
    assert len(thr ^ rank) <= 0.02 * len(thr | rank) + 8  # boundary rows only


def test_top_fraction_approx_matches_exact(spark):
    rows = [(i, f"s{i % 4}", float((i * 37) % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, score DOUBLE")
    exact = _keys(
        sampling.top_fraction_per_group(df, "src", "score", 0.25, "doc_id").select("doc_id")
    )
    approx = _keys(
        sampling.top_fraction_per_group_approx(df, "src", "score", 0.25).select("doc_id")
    )
    # sketch boundary wobble only: symmetric difference stays small
    assert len(exact ^ approx) <= 0.02 * len(exact | approx) + 8


def _cap_reference(rows, group_ix, key_ix, n, seed):
    # python re-derivation of cap_per_group's contract: per group, the
    # n rows with the smallest (hash code, key)
    from rnadam_spark.functions.hashing import MOD, hash_family

    a, b = hash_family(1, seed)[0]
    by_group = {}
    for r in rows:
        code = ((r[key_ix] % MOD + MOD) % MOD * a + b) % MOD
        by_group.setdefault(r[group_ix], []).append((code, r[key_ix], r))
    kept = []
    for g, items in by_group.items():
        items.sort(key=lambda t: (t[0], t[1]))
        kept.extend(t[2] for t in items[:n])
    return {tuple(r) for r in kept}


def test_cap_per_group_exact_and_deterministic(spark):
    # skewed groups: one hot domain (1500 rows), several small ones
    rows = [(i, "hot" if i < 1500 else f"d{i % 7}", i * 31 % 977) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, domain STRING, x BIGINT")
    got = sampling.cap_per_group(df, "domain", 40, "doc_id", seed=23)
    want = _cap_reference([tuple(r) for r in rows], 1, 0, 40, 23)
    assert {tuple(r) for r in got.collect()} == want
    # partitioning invariance — the audit property
    again = sampling.cap_per_group(df.repartition(17), "domain", 40, "doc_id", seed=23)
    assert {tuple(r) for r in again.collect()} == want
    # per-group sizes: exactly min(n, group size)
    sizes = {
        r.domain: r.n
        for r in got.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert sizes["hot"] == 40
    for d in [f"d{i}" for i in range(7)]:
        assert sizes[d] == min(40, sum(1 for r in rows if r[1] == d))


def test_cap_per_group_matches_duckdb_window(spark):
    import duckdb

    from rnadam_spark.operators.sampling import sample_code_sql

    rows = [(i, f"g{(i * i) % 5}") for i in range(3000)]
    df = spark.createDataFrame(rows, "k BIGINT, g STRING")
    got = {(r.k, r.g) for r in sampling.cap_per_group(df, "g", 100, "k", seed=7).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (r[0], r[1])
        for r in con.execute(
            f"""
            SELECT k, g FROM (
              SELECT k, g, row_number() OVER (
                PARTITION BY g ORDER BY {sample_code_sql('k', 7)}, k
              ) AS rn FROM t
            ) WHERE rn <= 100
            """
        ).fetchall()
    }
    assert got == want


def test_cap_per_group_negative_keys_and_tiny_n(spark):
    # xxhash64-minted ids are negative half the time; n=1 exercises the
    # max slack relative to n
    df = spark.createDataFrame(
        [(i * 2654435761 % (2**63) - 2**62, f"g{i % 3}") for i in range(999)],
        "k BIGINT, g STRING",
    )
    got = sampling.cap_per_group(df, "g", 1, "k", seed=3)
    sizes = [r.n for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()]
    assert sizes == [1, 1, 1]


def test_stratified_sample_matches_retired_oracle(spark):
    # the round-8-retired gate row's DuckDB oracle, kept exercised here
    # (the rotation discipline: retired rows keep their cross-check)
    import duckdb

    from rnadam_spark.queries.pipeline_q import (
        _LANG_DEFAULT,
        _LANG_FRACTIONS,
        _STRATA_CASE,
        SAMPLE_SEED,
        stratified_sample_by_lang,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.lang) for r in stratified_sample_by_lang(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            f"""SELECT doc_id, lang FROM documents
                WHERE {sampling.sample_code_sql("doc_id", SAMPLE_SEED)} < {_STRATA_CASE}"""
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_cap_per_group_rescues_zero_survivor_group(spark):
    # adversarial construction: every key in the hot group hashes ABOVE
    # the refinement threshold, so the pre-filter keeps zero rows and
    # the lazy fallback must re-rank the full group (left-join coalesce
    # path — a group absent from the survivor counts is still flagged)
    from rnadam_spark.functions.hashing import MOD, hash_family

    seed, n, cnt = 23, 1, 400
    a, b = hash_family(1, seed)[0]
    slack = int(n + 6 * (n**0.5) + 20)
    thr = -(-MOD * slack // cnt)  # ceil, mirrors the operator

    def code(k):
        return ((k % MOD + MOD) % MOD * a + b) % MOD

    keys, k = [], 0
    while len(keys) < cnt:
        if code(k) >= thr:
            keys.append(k)
        k += 1
    rows = [(key, "hot") for key in keys] + [(10**9 + i, f"s{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "k BIGINT, g STRING")
    got = sampling.cap_per_group(df, "g", n, "k", seed=seed).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r.k)
    # exactly one survivor for the hot group: the min-(code, key) row
    want = min(keys, key=lambda x: (code(x), x))
    assert by_g["hot"] == [want]
    assert all(len(v) == 1 for v in by_g.values()) and len(by_g) == 4
