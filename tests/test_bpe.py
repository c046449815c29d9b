"""BPE tokenizer training and encoding (operators/bpe.py) against a
python reference implementation."""

from __future__ import annotations

from collections import Counter

from rnadam_spark.operators import bpe

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "low new low new lowest"),
    (4, ""),
]


def _py_train(rows, n_merges):
    """Reference BPE: word-frequency table, overlapping pair counts,
    greedy left-to-right merge, ties to lexicographically-smallest."""
    freqs = Counter()
    for _, t in rows:
        freqs.update(t.split())
    words = {w: [c for c in w] for w in freqs}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        # tie-break: highest count, then smallest (left, right)
        top_cnt = max(pairs.values())
        (a, b), cnt = sorted(p for p, c in pairs.items() if c == top_cnt)[0], top_cnt
        if cnt < 2:
            break
        merges.append((rank, a, b))
        for w, syms in words.items():
            out, carry = [], None
            for s in syms:
                if carry is None:
                    carry = s
                elif carry == a and s == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            words[w] = out
    return merges, words, freqs


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges, word_pieces = bpe.train_bpe(df, n_merges=10)
    ref_merges, ref_words, ref_freqs = _py_train(CORPUS, 10)
    assert merges == ref_merges
    got = {r.word: (list(r.pieces), r.cnt) for r in word_pieces.collect()}
    assert got == {w: (syms, ref_freqs[w]) for w, syms in ref_words.items()}


def test_train_bpe_partitioning_invariant(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    m1, _ = bpe.train_bpe(df, n_merges=6)
    m2, _ = bpe.train_bpe(df.repartition(7), n_merges=6)
    assert m1 == m2


def test_train_bpe_stops_when_dry(spark):
    # all-distinct characters: no pair ever repeats -> zero merges
    df = spark.createDataFrame([(1, "abc xyz")], ["doc_id", "text"])
    merges, word_pieces = bpe.train_bpe(df, n_merges=5)
    assert merges == []
    got = {r.word: list(r.pieces) for r in word_pieces.collect()}
    assert got == {"abc": ["a", "b", "c"], "xyz": ["x", "y", "z"]}


def test_bpe_encode(spark):
    train = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges, word_pieces = bpe.train_bpe(train, n_merges=10)
    _, ref_words, _ = _py_train(CORPUS, 10)
    docs = spark.createDataFrame(
        [
            (10, "low newest"),
            (11, "zap low"),  # 'zap' is OOV -> char fallback
            (12, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in bpe.bpe_encode(docs, word_pieces).collect()}
    want10 = ref_words["low"] + ref_words["newest"]
    assert list(got[10].pieces) == want10
    assert got[10].n_words == 2 and got[10].n_pieces == len(want10)
    assert list(got[11].pieces) == ["z", "a", "p"] + ref_words["low"]
    assert got[12].n_words == 0 and list(got[12].pieces) == []


def test_bpe_encode_plan_broadcasts(spark):
    train = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    _, word_pieces = bpe.train_bpe(train, n_merges=4)
    docs = spark.createDataFrame([(1, "low new")], ["doc_id", "text"])
    plan = (
        bpe.bpe_encode(docs, word_pieces)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_token_stats_matches_retired_oracle(spark, sf_dir):
    # gate rotation r12 retired the bpe_token_stats CORRECTNESS row
    # (slot → the native ingestion rows in ingest_q.py); the
    # pre-tokenizer kernel stays gate-verified through
    # token_budget_rollup's identical CTE, and the per-doc stats keep
    # their direct cross-engine check here
    import os

    import duckdb

    from rnadam_spark.queries.pipeline_q import _BPE_STATS_SQL, bpe_token_stats

    got = sorted(tuple(r) for r in bpe_token_stats(spark, sf_dir).collect())
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_BPE_STATS_SQL).fetchall()))
    assert got == want and len(got) > 0
