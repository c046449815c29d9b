"""Pin the sf10 python text references (tools/pyref_text_oracle.py —
used where the DuckDB token/n-gram CTE oracles OOM) against the DuckDB
oracles at a scale where BOTH are feasible, for all three rows. The
cross-engine regex subtleties (Java ASCII \\s vs python unicode \\s,
\\p{L} classes) and the float chains (idf literals, avgdl, hround) are
exactly what this test guards."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest


def _load_ref():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "pyref_text_oracle.py",
    )
    spec = importlib.util.spec_from_file_location("pyref_text_oracle", path)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["pyref_text_oracle"] = ref  # ProcessPool pickles by module name
    spec.loader.exec_module(ref)
    return ref


@pytest.fixture(scope="module")
def expected(sf_dir):
    return _load_ref().expected_all(sf_dir)


@pytest.mark.parametrize(
    "name", ["bpe_token_stats", "bm25_topk", "contamination_scores"]
)
def test_pyref_text_oracle_matches_duckdb(sf_dir, expected, name):
    from __spark_entry__ import oracle_sql

    from rnadam_spark.queries.pipeline_q import _BPE_STATS_SQL

    # bpe_token_stats retired from the registry in the r12 rotation;
    # its oracle SQL lives on as the module constant the pytest
    # DuckDB twin uses, and the python reference stays pinned to it
    sqls = dict(oracle_sql())
    sqls.setdefault("bpe_token_stats", _BPE_STATS_SQL)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = set(map(tuple, con.execute(sqls[name]).fetchall()))
    assert expected[name] == want and want


def test_ascii_whitespace_tokenization_matches_java():
    # NBSP (\xa0) is unicode whitespace but NOT Java \s: it must stay
    # inside a token, and the 13-gram / bm25 token streams must agree
    ref = _load_ref()
    assert ref._ws_tokens("a\xa0b c\td\ne") == ["a\xa0b", "c", "d", "e"]
    pat = ref._bpe_regex()
    toks = pat.findall("don't stop\xa0now")
    # \xa0 is not ASCII \s, not \p{L}, not \p{N} -> it lands in the
    # punctuation class and COUNTS as a token, exactly as Java's
    # ~rlike('^\\s+$') counts it; python's unicode \s would have
    # classified it whitespace and dropped it
    import re as _re

    ws_only = _re.compile(r"\s+\Z", _re.ASCII)
    assert "\xa0" in "".join(toks)
    counted = [t for t in toks if not ws_only.match(t)]
    assert any("\xa0" in t for t in counted)
