"""Relevance scoring over the document corpus: TF-IDF / BM25.

A curated corpus doubles as a retrieval target (eval-set mining,
near-query sampling, "find me training docs about X"), so the engine
needs term-relevance ranking alongside embedding ANN. BM25 (Robertson &
Sparck Jones; the Okapi formulation) over the documents table:

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                          (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale shape — two jobs, no explode, no per-term shuffle:

1. **Corpus statistics pass**: one aggregate computes N, avgdl, and
   df(t) for every query term as conditional-sum columns (|query| tiny
   integers to the driver — never a corpus-keyed groupBy; a term-keyed
   df table would shuffle every token occurrence for terms nobody
   queried).
2. **Scoring pass**: idf values inline as literals; per-document tf is
   an in-row count over the token array; the whole score is a
   zero-shuffle projection + TakeOrdered top-k.

Tokenization is the engine-portable ``[a-z0-9]+`` lowercase extraction
(same as C4 bad-word matching and the DuckDB cross-check).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.rounding import hround


def _terms_of(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def corpus_stats(
    docs: DataFrame, query_terms: list[str], text_col: str = "text"
) -> tuple[int, float, dict[str, int]]:
    """(N, avgdl, {term: df}) in ONE corpus aggregate: document
    frequency per query term is a conditional sum over an in-row
    membership test, so the pass costs |query| boolean columns — no
    token explode, no shuffle beyond the final scalar reduction."""
    toks = _terms_of(text_col)
    aggs = [
        F.count("*").alias("_n"),
        F.avg(F.size(toks)).alias("_avgdl"),
    ] + [
        F.sum(F.array_contains(toks, t).cast("bigint")).alias(f"_df_{i}")
        for i, t in enumerate(query_terms)
    ]
    row = docs.agg(*aggs).collect()[0]
    dfs = {t: int(row[f"_df_{i}"] or 0) for i, t in enumerate(query_terms)}
    return int(row["_n"]), float(row["_avgdl"] or 0.0), dfs


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: tuple[int, float, dict[str, int]] | None = None,
) -> DataFrame:
    """(doc_id, score): top-k documents by Okapi BM25 for a free-text
    ``query``. Pass ``stats`` (from :func:`corpus_stats`, possibly
    computed once and reused across many queries) to skip the corpus
    pass — the production pattern where N/avgdl/df come from a
    maintained statistics table."""
    terms = sorted(set(_py_terms(query)))
    if not terms:
        raise ValueError("query contains no indexable terms")
    n, avgdl, dfs = stats if stats is not None else corpus_stats(docs, terms, text_col)
    toks = _terms_of(text_col)
    dl = F.size(toks).cast("double")
    denom_norm = 1.0 - b + b * dl / F.lit(max(avgdl, 1e-9))
    def term_tf(term: str) -> Column:
        # closure helper, NOT a two-arg lambda default: filter() feeds a
        # second lambda parameter the element INDEX (the trimStr-class
        # gotcha documented at repetition.lines_of), so `lambda x, t=t`
        # would compare tokens against positions
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")

    score: Column = F.lit(0.0)
    for t in terms:
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        tf = term_tf(t)
        score = score + F.lit(idf) * tf * (k1 + 1.0) / (tf + k1 * denom_norm)
    return (
        docs.select(F.col(id_col), hround(score, 6).alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def _py_terms(s: str) -> list[str]:
    import re

    return re.findall(r"[a-z0-9]+", s.lower())
