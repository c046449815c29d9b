"""SentencePiece-style unigram-LM tokenizer training (Kudo, ACL 2018),
distributed.

Completes the tokenizer pair: :mod:`operators/bpe` learns a merge
table bottom-up; this learns a piece VOCABULARY top-down — seed with
frequent substrings, EM toward the piece probabilities that best
explain the corpus, prune to the target vocabulary. The hard-EM
(Viterbi) variant is used: deterministic, and the E-step is exactly
the segmentation the encoder will apply, so train and encode share one
code path.

Scale design (the same bounded-state shape as the engine's other
iterative trainers — EM quantify, k-means, BPE):

- Everything operates on the DISTINCT-WORD table (word, cnt): one
  corpus pass, then every EM iteration costs O(|vocab of words|), not
  corpus size.
- The model is (piece, logprob) bounded by ``vocab_size`` — it crosses
  driver↔executor as a closure dict (megabytes at the standard 32k–
  256k vocab), the centroid/codebook pattern.
- Per EM iteration: ONE Arrow-batched ``mapInPandas`` pass over the
  word table (per-word Viterbi is a tight O(len·max_piece_len) DP —
  genuinely imperative, the documented escape hatch) + one bounded
  groupBy(piece) whose result collects to the driver as the next
  model. The corpus itself is never touched inside the loop.
- Encoding reuses :func:`operators.bpe.bpe_encode`'s broadcast
  word→pieces join verbatim: segment the corpus's distinct words once,
  broadcast, join — the scan stays shuffle-free.

Determinism: seed selection orders by (score desc, piece asc); Viterbi
breaks score ties toward the LONGER piece (smaller split point); both
are partitioning-independent, so training reproduces bit-identically
on any layout.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rnadam_spark.operators.bpe import bpe_encode, word_frequencies

WORD_PIECES = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("pieces", T.ArrayType(T.StringType()), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


def seed_vocab(
    words: DataFrame, max_piece_len: int = 4, seed_size: int = 1000
) -> dict[str, float]:
    """Initial piece log-probabilities: the ``seed_size`` highest-scoring
    substrings (score = occurrence-weighted character mass, Kudo's
    freq·len criterion) of the distinct-word table, PLUS every single
    character (full coverage — any word must be segmentable). One
    explode + one bounded groupBy; the top-k comes back via TakeOrdered."""
    subs = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(max_piece_len), F.length("word") - i + 1),
                        ),
                        lambda l: F.col("word").substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
        "cnt",
    )
    scored = (
        subs.groupBy("piece")
        .agg(F.sum("cnt").alias("occ"))
        .select("piece", (F.col("occ") * F.length("piece")).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), "piece").limit(seed_size).collect()
    chars = (
        words.select(F.explode(F.split("word", "")).alias("piece"))
        .filter(F.length("piece") > 0)
        .distinct()
        .collect()
    )
    pieces = {r["piece"] for r in top} | {r["piece"] for r in chars}
    lp = math.log(1.0 / len(pieces))
    return {p: lp for p in sorted(pieces)}


def _viterbi(word: str, logprobs: dict[str, float], max_piece_len: int, unk: float) -> list[str]:
    """Best segmentation of ``word`` under the model; unseen single
    characters cost ``unk``. Ties prefer the longer piece."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logprobs.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk  # single-char fallback keeps every word segmentable
            s = best[j] + lp
            if s > best[i]:  # strict: first (smallest j = longest piece) wins ties
                best[i] = s
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def segment_words(
    words: DataFrame, logprobs: dict[str, float], max_piece_len: int = 4
) -> DataFrame:
    """(word, pieces, cnt): Viterbi-segment each distinct word under the
    model — ONE Arrow-batched pass; the model rides into the task as a
    closure dict (bounded by vocab_size)."""
    unk = (min(logprobs.values()) if logprobs else 0.0) - 10.0

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": pdf["word"].map(
                        lambda w: _viterbi(w, logprobs, max_piece_len, unk)
                    ),
                    "cnt": pdf["cnt"].astype("int64"),
                }
            )

    return words.select("word", "cnt").mapInPandas(seg, WORD_PIECES)


def train_unigram(
    corpus: DataFrame,
    vocab_size: int,
    em_iters: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 1000,
    text_col: str = "text",
) -> tuple[dict[str, float], DataFrame]:
    """Learn a unigram-LM piece vocabulary. Returns ``(model,
    word_pieces)``: the (piece → logprob) dict bounded by
    ``vocab_size`` (single characters always retained), and the final
    training-word segmentations — the broadcast encode table for
    :func:`unigram_encode`.

    Loop shape per EM iteration: segment the word table (one
    mapInPandas pass) → piece counts (one bounded groupBy, collected as
    the next model) → re-normalize. After the final iteration the vocab
    prunes to the ``vocab_size`` highest-count pieces."""
    words = word_frequencies(corpus, text_col)
    model = seed_vocab(words, max_piece_len=max_piece_len, seed_size=seed_size)
    chars = {p for p in model if len(p) == 1}
    seg = None
    for it in range(em_iters):
        seg = segment_words(words, model, max_piece_len)
        counts = {
            r["piece"]: r["n"]
            for r in seg.select(F.explode("pieces").alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        }
        last = it == em_iters - 1
        if last:
            ranked = sorted(
                (p for p in counts if p not in chars),
                key=lambda p: (-counts[p], p),
            )
            keep = chars | set(ranked[: max(vocab_size - len(chars), 0)])
            counts = {p: c for p, c in counts.items() if p in keep}
            for c in chars:  # a char can be absent from every Viterbi path
                counts.setdefault(c, 1)
        total = sum(counts.values())
        model = {p: math.log(c / total) for p, c in sorted(counts.items())}
    final_seg = segment_words(words, model, max_piece_len)
    return model, final_seg


def unigram_encode(
    docs: DataFrame,
    word_pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces): encode with the trained
    segmentations — the exact broadcast word→pieces join
    :func:`operators.bpe.bpe_encode` uses (OOV words fall back to
    character pieces there; pass segmentations from
    :func:`segment_words` over the corpus's own distinct words to
    Viterbi-cover OOV instead)."""
    return bpe_encode(docs, word_pieces, text_col=text_col, id_col=id_col)
