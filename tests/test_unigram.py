"""Unigram-LM tokenizer training (operators/unigram.py): convergence on
a compositional corpus, coverage, determinism, and encode round-trip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rnadam_spark.operators import unigram


def _corpus(spark):
    # words built from two frequent morphemes: the trainer should give
    # "ab" and "cd" high probability and segment composites with them
    rows = [
        (1, "abcd abcd abcd ab cd"),
        (2, "abab cdcd abcd abcd"),
        (3, "ab ab cd cd abcd xyz"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_recovers_morphemes_and_coverage(spark):
    model, seg = unigram.train_unigram(
        _corpus(spark), vocab_size=10, em_iters=3, max_piece_len=2, seed_size=6
    )
    assert "ab" in model and "cd" in model
    # frequent morphemes beat rare singles
    assert model["ab"] > model.get("x", -math.inf)
    assert len(model) <= 10  # vocab bound (the 7 corpus chars count inside it)
    segs = {r.word: list(r.pieces) for r in seg.collect()}
    # every segmentation concatenates back to its word (full coverage,
    # including the never-seeded 'xyz')
    for w, pieces in segs.items():
        assert "".join(pieces) == w, (w, pieces)
    assert segs["abcd"] == ["ab", "cd"]
    assert segs["abab"] == ["ab", "ab"]


def test_train_partitioning_invariant(spark):
    docs = _corpus(spark)
    m1, s1 = unigram.train_unigram(docs, vocab_size=8, em_iters=2, max_piece_len=2, seed_size=6)
    m2, s2 = unigram.train_unigram(
        docs.repartition(7), vocab_size=8, em_iters=2, max_piece_len=2, seed_size=6
    )
    assert m1 == m2
    assert {(r.word, tuple(r.pieces)) for r in s1.collect()} == {
        (r.word, tuple(r.pieces)) for r in s2.collect()
    }


def test_unigram_encode_roundtrip(spark):
    docs = _corpus(spark)
    model, seg = unigram.train_unigram(docs, vocab_size=8, em_iters=2, max_piece_len=2, seed_size=6)
    enc = {r.doc_id: r for r in unigram.unigram_encode(docs, seg).collect()}
    assert enc[2].n_words == 4
    # pieces concatenate to the whitespace-stripped doc text
    assert "".join(enc[2].pieces) == "ababcdcdabcdabcd"
    # encoding is a broadcast join on the scan side
    plan = unigram.unigram_encode(docs, seg)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_viterbi_prefers_longer_piece_on_ties(spark):
    # equal-probability model: "ab" vs ["a","b"] — two pieces cost two
    # logprobs, one piece costs one, so longer wins on probability; with
    # a crafted exact tie the longer piece must still win
    lp = {"ab": -2.0, "a": -1.0, "b": -1.0}
    assert unigram._viterbi("ab", lp, 2, -99.0) == ["ab"]
    # unseen char falls back to unk, never crashes
    assert unigram._viterbi("aqb", lp, 2, -99.0) == ["a", "q", "b"]
