"""Distributed BPE tokenizer training and encoding.

Completes the tokenizer-side curation story (`text.bpe_token_stats`
counts with a fixed pre-tokenizer regex; `text.vocabulary` measures
tf/df): `train_bpe` LEARNS the merge table, the way a production
pipeline trains its tokenizer on (a sample of) the corpus it just
curated. The loop structure mirrors the engine's other iterative
algorithms (EM `algorithms/quantify.py`, k-means
`operators/similarity.py`, connected components
`operators/clustering.py`): DataFrame state, driver holds only O(1)
loop variables per iteration, lineage truncated as the loop runs.

Scale design — the reason BPE training distributes at all:

- Training operates on the DISTINCT-WORD table (word, symbols, cnt),
  never the raw corpus: one corpus pass builds word frequencies, and
  every merge iteration then costs O(|vocab|), bounded by the language
  (~10^6-10^7 rows at 100 TB), not by corpus size. Train on a
  `hash_sample` of the corpus for further cheapness — word frequency
  ranks converge long before 100 TB.
- Per iteration: adjacent-pair counts explode off the word table (one
  groupBy whose partial aggregates are map-side), the single best pair
  comes to the driver (one 2-string row — the k-means-centroid
  pattern), and the merge applies as a pure fold expression over each
  word's symbol array. One shuffle per iteration, no window, no UDF.
- Encoding never replays merges: words join the trained word→pieces
  table (broadcast; it is the distinct-word table) and only
  out-of-vocabulary words fall back to character pieces. The corpus
  scan stays shuffle-free.

Semantics pinned for the tests' python reference: words are whitespace
tokens; initial symbols are single characters (no end-of-word marker);
pair counts weight by word frequency and count overlapping pairs
(``"aaa"`` contributes 2 to ``(a,a)``); merges apply greedily
left-to-right; the best pair each round is ``max by (count, then
lexicographically-smallest (left, right))`` so training is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rnadam_spark.functions.shingles import char_shingles, tokens
from rnadam_spark.lineage import truncate_lineage


def _chars_of(col: Column) -> Column:
    """Single-character symbol array of a string column."""
    return char_shingles(col, 1)


def _merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs
    into one concatenated symbol — a single fold (``F.aggregate``) with
    a (result, carry) accumulator, entirely JVM-side."""
    acc_t = "struct<res: array<string>, carry: string>"
    init = F.struct(
        F.array().cast(T.ArrayType(T.StringType())).alias("res"),
        F.lit(None).cast("string").alias("carry"),
    ).cast(acc_t)

    def step(acc: Column, s: Column) -> Column:
        res, carry = acc["res"], acc["carry"]
        return (
            F.when(
                carry.isNull(),
                F.struct(res.alias("res"), s.alias("carry")).cast(acc_t),
            )
            .when(
                (carry == left) & (s == right),
                F.struct(
                    F.concat(res, F.array(F.concat(carry, s))).alias("res"),
                    F.lit(None).cast("string").alias("carry"),
                ).cast(acc_t),
            )
            .otherwise(
                F.struct(F.concat(res, F.array(carry)).alias("res"), s.alias("carry")).cast(
                    acc_t
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["carry"].isNull(), acc["res"]).otherwise(
            F.concat(acc["res"], F.array(acc["carry"]))
        )

    return F.aggregate(syms, init, step, finish)


def _adjacent_pairs(syms: Column) -> Column:
    """Array of (left, right) structs for each adjacent symbol pair."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left: string, right: string>>"))


def word_frequencies(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the one corpus pass BPE training needs."""
    return (
        corpus.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def train_bpe(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    truncate_every: int = 8,
):
    """Learn ``n_merges`` BPE merges from a corpus. Returns
    ``(merges, word_pieces)``:

    - ``merges``: list of ``(rank, left, right)`` in training order —
      the tokenizer artifact.
    - ``word_pieces``: DataFrame (word, pieces array<string>, cnt) —
      every training word in its final segmentation, which doubles as
      the broadcast encode table for :func:`bpe_encode`.

    Stops early when no adjacent pair occurs twice (merging a
    singleton pair earns nothing). Driver state per iteration is one
    (left, right, cnt) row; the word-table lineage is truncated every
    ``truncate_every`` merges (reliable checkpoint when
    ``checkpoint_dir`` is set, as in the EM loop)."""
    words = word_frequencies(corpus, text_col).select(
        "word", _chars_of(F.col("word")).alias("syms"), "cnt"
    )
    words = truncate_lineage(words, checkpoint_dir)
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        best = (
            words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p")
            .agg(F.sum("cnt").alias("pair_cnt"))
            .orderBy(F.col("pair_cnt").desc(), F.col("p.left"), F.col("p.right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_cnt"] < 2:
            break
        left, right = best[0]["p"]["left"], best[0]["p"]["right"]
        merges.append((rank, left, right))
        words = words.select(
            "word", _merge_pair_expr(F.col("syms"), left, right).alias("syms"), "cnt"
        )
        if (rank + 1) % truncate_every == 0:
            words = truncate_lineage(words, checkpoint_dir)
    word_pieces = words.select("word", F.col("syms").alias("pieces"), "cnt")
    return merges, word_pieces


def bpe_encode(
    docs: DataFrame,
    word_pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces): encode documents with a
    trained tokenizer — each word becomes its trained segmentation via
    a broadcast join on the word-pieces table; words never seen in
    training fall back to single-character pieces (the no-replay OOV
    rule documented in the module docstring). ``pieces`` is the
    document's piece sequence in word order.

    The corpus side is explode → broadcast join → doc_id re-aggregation
    (order restored by the exploded position): one shuffle, no merge
    replay, no Python."""
    wp = F.broadcast(word_pieces.select(F.col("word").alias("tok"), "pieces"))
    exploded = docs.select(
        F.col(id_col), F.posexplode_outer(tokens(text_col)).alias("pos", "tok")
    )
    joined = exploded.join(wp, "tok", "left").select(
        id_col,
        "pos",
        "tok",
        F.coalesce(F.col("pieces"), _chars_of(F.col("tok"))).alias("pieces"),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.when(
                F.col("tok").isNotNull(),
                F.struct(F.col("pos").alias("pos"), F.col("pieces").alias("pieces")),
            )
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("tok").cast("bigint").alias("n_words"),
        F.coalesce(
            F.sum(F.when(F.col("tok").isNotNull(), F.size("pieces"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_pieces"),
        F.flatten(F.transform(ordered, lambda x: x["pieces"])).alias("pieces"),
    )
