"""Shingling expressions — the engine's core custom scalar op.

The reference's ``sequence.sliding(kmerLength)`` (rice-core/.../algorithms/
Index.scala:87-89, SURVEY.md P2) and its dinucleotide variant
(Tare.scala:88-91, P3) are character shingles. Spark has no built-in
char-shingle, but it composes from ``sequence`` + ``transform`` +
``substring`` — pure Catalyst expressions, whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _empty_str_array() -> Column:
    return F.array().cast(T.ArrayType(T.StringType()))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def char_shingles(col: Column | str, k: int) -> Column:
    """All overlapping length-``k`` substrings of a string column.

    ``sliding(k)`` re-expressed declaratively: generate start positions
    ``1..len-k+1`` and substring each. Stays JVM-side (codegen), so at
    100 TB the explode of its output is the only cost — no Python
    boundary. Strings shorter than ``k`` yield an empty array — a
    deliberate divergence from Scala's ``sliding(k)``, which emits the
    whole short string as one truncated "k-mer" (Index.scala:88): a
    truncated k-mer is never a valid index/count key, and the
    reference's own inputs (transcripts/reads) are always ≥ k, so the
    branch is unreachable there; here short documents simply produce
    no shingles.
    """
    c = _c(col)
    n = F.length(c) - F.lit(k - 1)
    return F.when(n >= 1, F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))).otherwise(
        _empty_str_array()
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: F.length(t) > 0)


def ngrams_of(toks: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams from an ALREADY-TOKENIZED array column — the
    materialized-prelude form of :func:`token_ngrams`, for staged
    operators that tokenize once and build several gram widths from
    the same array."""
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(0), cnt - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), sep),
        ),
    ).otherwise(_empty_str_array())


def token_ngrams(col: Column | str, n: int, sep: str = " ") -> Column:
    """Word n-grams of a string column (tokenize, then slide over tokens)."""
    return ngrams_of(tokens(col), n, sep)
