"""Leakage-safe corpus splitting (operators/splits.py): near-dup
clusters never straddle a split, assignment is deterministic across
partitionings, and singleton assignment matches the hash arithmetic."""

from __future__ import annotations

import pytest

from rnadam_spark.functions.hashing import MOD, hash_family
from rnadam_spark.operators import splits

DOCS = [(i, f"doc {i}") for i in range(1, 21)]
# two clusters: {1,2,3} (chained — 1~3 only via 2) and {7,8}
PAIRS = [(1, 2), (2, 3), (7, 8)]
FRACTIONS = {"train": 0.6, "val": 0.2, "test": 0.2}


def _py_split(group_id, seed=23):
    a, b = hash_family(1, seed)[0]
    code = (group_id % MOD * a + b) % MOD
    if code < int(0.6 * MOD):
        return "train"
    if code < int(0.8 * MOD):
        return "val"
    return "test"


def _assign(spark, docs=DOCS, pairs=PAIRS):
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    p = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    return {
        r.doc_id: (r.group_id, r.split)
        for r in splits.leakage_safe_split(d, p, FRACTIONS).collect()
    }


def test_clusters_stay_whole(spark):
    got = _assign(spark)
    assert len(got) == len(DOCS)  # every doc assigned exactly once
    # chained cluster {1,2,3}: one group, one split — including the
    # transitive 1~3 pair that shares no direct edge
    assert got[1] == got[2] == got[3]
    assert got[1][0] == 1  # canonical id = min member
    assert got[7] == got[8]
    assert got[7][0] == 7


def test_singletons_match_hash_arithmetic(spark):
    got = _assign(spark)
    for doc_id in (4, 5, 6, 9, 10, 15, 20):
        assert got[doc_id][0] == doc_id
        assert got[doc_id][1] == _py_split(doc_id)
    # cluster members are hashed by GROUP id, not their own id
    assert got[2][1] == _py_split(1)
    assert got[8][1] == _py_split(7)


def test_deterministic_across_partitionings(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    p = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    one = {
        (r.doc_id, r.group_id, r.split)
        for r in splits.leakage_safe_split(d, p, FRACTIONS).collect()
    }
    two = {
        (r.doc_id, r.group_id, r.split)
        for r in splits.leakage_safe_split(
            d.repartition(7), p.repartition(3), FRACTIONS
        ).collect()
    }
    assert one == two


def test_assign_split_plain_and_validation(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.split for r in splits.assign_split(d, "doc_id", FRACTIONS).collect()}
    assert got == {doc_id: _py_split(doc_id) for doc_id, _ in DOCS}
    with pytest.raises(ValueError):
        splits.split_column("doc_id", {"train": 0.5, "val": 0.1})


def test_default_fractions_cover_everything(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    p = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    rows = splits.leakage_safe_split(d, p).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert len(rows) == len(DOCS)


def test_negative_ids_hash_uniformly(spark):
    # xxhash64-minted doc ids (reads_from_fastq, warc html_responses)
    # are negative half the time; the split hash must treat them like
    # any other key instead of funneling them all into the first split
    # (sign-preserving % would put every negative code below every
    # boundary)
    docs = spark.createDataFrame(
        [(i,) for i in range(-4000, 0)], ["doc_id"]
    )
    got = splits.assign_split(docs, "doc_id", FRACTIONS)
    counts = {r.split: r.n for r in got.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.5 < counts["train"] / 4000 < 0.7  # ≈0.6, not 1.0


def test_assign_split_matches_duckdb(spark):
    """Engine-portable split verdicts: the same pmod/affine arithmetic
    and cumulative boundaries as one DuckDB statement — the oracle a
    future gate rotation would register."""
    import duckdb

    from rnadam_spark.operators.sampling import sample_code_sql

    rows = [(i,) for i in range(-50, 200)]
    df = spark.createDataFrame(rows, ["doc_id"])
    got = {r.doc_id: r.split for r in splits.assign_split(df, "doc_id", FRACTIONS).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT)")
    con.executemany("INSERT INTO d VALUES (?)", rows)
    b1, b2 = int(0.6 * MOD), int(0.8 * MOD)
    want = dict(
        con.execute(
            f"""
            SELECT doc_id, CASE WHEN code < {b1} THEN 'train'
                                WHEN code < {b2} THEN 'val'
                                ELSE 'test' END
            FROM (SELECT doc_id, ({sample_code_sql('doc_id', 23)}) AS code FROM d)
            """
        ).fetchall()
    )
    assert got == want
