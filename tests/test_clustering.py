"""Connected-components dedup clustering (operators/clustering.py)."""

import pytest

from pyspark.sql import functions as F

from rnadam_spark.operators import clustering


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    return {
        r.node: r.component
        for r in clustering.connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min(spark):
    # worst case for naive min-propagation: a pure chain — star rounds
    # collapse it in O(log n)
    pairs = [(i, i + 1) for i in range(1, 12)]
    got = _cc(spark, pairs)
    assert got == {i: 1 for i in range(1, 13)}


def test_two_components_and_reversed_edges(spark):
    pairs = [(5, 2), (2, 9), (40, 30), (30, 41)]
    got = _cc(spark, pairs)
    assert got == {2: 2, 5: 2, 9: 2, 30: 30, 40: 30, 41: 30}


def test_clique_and_singleton_pair(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (100, 200)]
    got = _cc(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 100: 100, 200: 100}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a BIGINT, doc_b BIGINT")
    assert clustering.connected_components(df).count() == 0


def test_converges_within_log_rounds(spark):
    # 64-node chain: naive propagation needs 63 rounds; stars need ~log.
    # max_rounds=10 bounds the loop — convergence inside it proves the
    # O(log n) behavior (10 rounds of naive propagation would leave the
    # far end of the chain unlabeled).
    pairs = [(i, i + 1) for i in range(1, 64)]
    got = _cc(spark, pairs, max_rounds=10)
    assert got == {i: 1 for i in range(1, 65)}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    # same components with reliable checkpointing into a directory
    from rnadam_spark.operators.clustering import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    got = {
        (r.node, r.component)
        for r in connected_components(
            pairs, checkpoint_dir=str(tmp_path / "cc_ckpt")
        ).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    import os

    assert any(os.scandir(tmp_path / "cc_ckpt"))


def test_random_graph_matches_union_find(spark):
    # seeded random graph, cross-checked against a driver-side
    # union-find oracle — the distributed star rounds must produce the
    # identical min-label components on arbitrary topology (mix of
    # chains, cliques, singleton pairs, hubs)
    import random

    rng = random.Random(20260813)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    expected = {v: find(v) for v in touched}

    got = _cc(spark, edges)
    assert got == expected
