"""Python reference oracles for the text gate rows whose DuckDB
oracles die at sf10: bm25_topk, contamination_scores, bpe_token_stats.

At sf10 (500k docs) the DuckDB twins OOM on their 10^8-row token /
n-gram CTEs even with a spill directory — the single-node ORACLE is
the ceiling, not the engine (the same shape tools/pyref_kmer_oracle.py
closed for the k-mer class rows). Same discipline: re-derive the
expected answer from the raw parquet with pure python that shares
nothing with the Spark plan, and pin the reference against the DuckDB
oracle at gate scale in pytest
(tests/test_pyref_text_oracle.py::test_pyref_text_oracle_matches_duckdb).

Cross-engine regex care (all pinned by the gate-scale test):
  - whitespace tokenization mirrors Spark's Java ``\\s`` (ASCII-only:
    [ \\t\\n\\x0B\\f\\r]) via ``re.ASCII`` — python's default \\s is
    unicode-aware and would split on NBSP etc.
  - the BPE pre-tokenizer needs unicode \\p{L}/\\p{N} *and* ASCII \\s
    in one pattern: the ``regex`` module with a global ``(?a)`` flag
    gives exactly that (ASCII scopes \\s/\\w/\\d; explicit \\p{...}
    properties stay unicode, matching Java and RE2).

Float care: every non-integer step is a single correctly-rounded IEEE
op in the same order as the Spark expression tree (idf literals via
math.log exactly as the Spark driver computes them; avgdl = exact int
sum / count, Spark's Average-over-int semantics; score accumulation
left-associated in sorted-term order; hround = floor(x*1e6+0.5)/1e6),
so results are bit-comparable, not approximately comparable.

Usage:
    python tools/pyref_text_oracle.py /tmp/sf10
    python tools/pyref_text_oracle.py /tmp/sf10 bm25_topk bpe_token_stats
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the process pool re-imports this module by name in workers
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single source of truth for the query constants
from rnadam_spark.operators.text import BPE_PATTERN  # noqa: E402
from rnadam_spark.queries.pipeline_q import (  # noqa: E402
    _BENCH_MOD,
    BM25_K,
    BM25_QUERY,
    DECONTAM_N,
)

_WS = re.compile(r"\s+", re.ASCII)  # Java \s: [ \t\n\x0B\f\r]
_TERM = re.compile(r"[a-z0-9]+")  # bm25's indexable-term alphabet
_BM25_TERMS = sorted(set(_TERM.findall(BM25_QUERY.lower())))
_K1, _B = 1.2, 0.75


def _bpe_regex():
    import regex

    # (?a) = ASCII \s (Java semantics); \p{L}/\p{N} stay unicode
    return regex.compile("(?a)" + BPE_PATTERN)


def _ws_tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text) if t]


def hround(x: float, d: int = 6) -> float:
    scale = float(10**d)
    return math.floor(x * scale + 0.5) / scale


def _gram_hash(gram: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest(), "little"
    )


def _chunk_stats(args: tuple[list[int], list[str | None]]) -> dict:
    """One pass over a chunk of documents → everything all three
    references need: bpe rows, bm25 partial sums + candidate rows, and
    per-doc distinct 13-gram hash sets (bench docs flagged)."""
    ids, texts = args
    bpe_pat = _bpe_regex()
    ws_only = re.compile(r"\s+\Z", re.ASCII)
    bpe_rows: list[tuple[int, int, float]] = []
    n_docs, sum_dl = 0, 0
    dfs = [0] * len(_BM25_TERMS)
    cand: list[tuple[int, int, list[int]]] = []  # (doc_id, dl, tf per term)
    contam: list[tuple[int, int, list[int], bool]] = []  # (doc, n_grams, hashes, is_bench)
    for doc_id, text in zip(ids, texts):
        text = text or ""
        # --- bpe_token_stats
        n_bpe = sum(1 for t in bpe_pat.findall(text) if not ws_only.match(t))
        bpe_rows.append(
            (doc_id, n_bpe, hround(float(len(text)) / float(max(n_bpe, 1)), 6))
        )
        # --- bm25 corpus stats + candidates
        terms = _TERM.findall(text.lower())
        n_docs += 1
        sum_dl += len(terms)
        tfs = [0] * len(_BM25_TERMS)
        seen_any = False
        for t in terms:
            for i, q in enumerate(_BM25_TERMS):
                if t == q:
                    tfs[i] += 1
                    seen_any = True
        for i in range(len(_BM25_TERMS)):
            if tfs[i]:
                dfs[i] += 1
        if seen_any:
            cand.append((doc_id, len(terms), tfs))
        # --- contamination grams
        toks = _ws_tokens(text)
        if len(toks) >= DECONTAM_N:
            grams = {
                _gram_hash(" ".join(toks[i : i + DECONTAM_N]))
                for i in range(len(toks) - DECONTAM_N + 1)
            }
        else:
            grams = set()
        contam.append(
            (doc_id, len(grams), sorted(grams), doc_id % _BENCH_MOD == 0)
        )
    return {
        "bpe": bpe_rows,
        "n": n_docs,
        "sum_dl": sum_dl,
        "dfs": dfs,
        "cand": cand,
        "contam": contam,
    }


def _map_chunks(sf_dir: str) -> list[dict]:
    from concurrent.futures import ProcessPoolExecutor

    import pyarrow.parquet as pq

    table = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = table.column("doc_id").to_pylist()
    texts = table.column("text").to_pylist()
    step = 5000
    chunks = [
        (ids[i : i + step], texts[i : i + step]) for i in range(0, len(ids), step)
    ]
    workers = min(30, os.cpu_count() or 4)
    with ProcessPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(_chunk_stats, chunks))


def expected_all(sf_dir: str) -> dict[str, set[tuple]]:
    """{query_name: expected row set} for all three references, from
    one parallel pass over the documents parquet."""
    parts = _map_chunks(sf_dir)

    bpe = {row for p in parts for row in p["bpe"]}

    # --- bm25: exact-int corpus stats, then the Spark float chain
    n = sum(p["n"] for p in parts)
    avgdl = sum(p["sum_dl"] for p in parts) / n  # Average-over-int: exact sum
    dfs = [sum(p["dfs"][i] for p in parts) for i in range(len(_BM25_TERMS))]
    idfs = [
        math.log((n - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
        for i in range(len(_BM25_TERMS))
    ]
    denom_base = max(avgdl, 1e-9)
    scored = []
    for p in parts:
        for doc_id, dl_i, tfs in p["cand"]:
            dl = float(dl_i)
            denom_norm = 1.0 - _B + _B * dl / denom_base
            score = 0.0
            for i in range(len(_BM25_TERMS)):
                tf = float(tfs[i])
                score = score + idfs[i] * tf * (_K1 + 1.0) / (tf + _K1 * denom_norm)
            r = hround(score, 6)
            if r > 0.0:
                scored.append((doc_id, r))
    scored.sort(key=lambda t: (-t[1], t[0]))
    bm25 = set(scored[:BM25_K])

    # --- contamination: union bench hashes, then membership counts
    bench: set[int] = set()
    for p in parts:
        for _doc, _n, hashes, is_bench in p["contam"]:
            if is_bench:
                bench.update(hashes)
    contam = set()
    for p in parts:
        for doc_id, n_grams, hashes, _ in p["contam"]:
            hits = sum(1 for h in hashes if h in bench)
            contam.add(
                (
                    doc_id,
                    n_grams,
                    hits,
                    hround(float(hits) / float(max(n_grams, 1)), 6),
                )
            )
    return {
        "bpe_token_stats": bpe,
        "bm25_topk": bm25,
        "contamination_scores": contam,
    }


def main() -> None:
    import time

    from rnadam_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["bpe_token_stats", "bm25_topk", "contamination_scores"]

    t0 = time.time()
    want_all = expected_all(sf_dir)
    t_ref = time.time() - t0

    spark = get_spark("pyref-text-oracle")
    qs = entrymod.queries()
    failed = 0
    for name in names:
        t0 = time.time()
        got = {tuple(r) for r in qs[name](spark, sf_dir).collect()}
        t_spark = time.time() - t0
        want = want_all[name]
        status = "OK" if got == want else "VALUE_MISMATCH"
        out = {
            "name": name,
            "oracle": "python_text_reference",
            "status": status,
            "sf_dir": sf_dir,
            "rows": len(got),
            "rows_expected": len(want),
            "sec_reference": round(t_ref, 2),
            "sec_spark": round(t_spark, 2),
        }
        if status != "OK":
            out["example"] = {
                "only_spark": [list(x) for x in sorted(got - want)[:3]],
                "only_reference": [list(x) for x in sorted(want - got)[:3]],
            }
            failed += 1
        print(json.dumps(out))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
