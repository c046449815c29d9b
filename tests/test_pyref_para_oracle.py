"""Pin the python paragraph-pair reference (tools/pyref_para_oracle.py
— used where even the DuckDB PAIR SQL is infeasible, r12 VERDICT
missing #3) against the DuckDB pair oracle at a scale where both are
feasible. The shingle-identity subtlety is exactly what this guards:
the verify stage intersects distinct 4-char STRINGS, the base-31 code
is not injective over printable ASCII, and the reference's 4x16-bit
packing must therefore reproduce DuckDB's list_intersect counts, not
the code-set approximation."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb


def _load_ref():
    tools = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    for name in ("unionfind_oracle", "pyref_para_oracle"):
        path = os.path.join(tools, f"{name}.py")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod  # fork workers resolve by module name
        spec.loader.exec_module(mod)
    return sys.modules["pyref_para_oracle"]


def test_python_pairs_match_duckdb_pair_sql(sf_dir):
    from rnadam_spark.queries.pipeline_q import _PARA_PAIRS_SQL

    ref = _load_ref()
    got = sorted(map(tuple, ref.derive_pairs(sf_dir).tolist()))
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_PARA_PAIRS_SQL).fetchall()))
    assert got == want and got


def test_base31_code_collides_where_strings_differ():
    # the reason ssets pack code points instead of reusing the minhash
    # code: distinct printable-ASCII 4-grams can share a base-31 code
    from rnadam_spark.functions.hashing import MOD

    def code(s: str) -> int:
        acc = ord(s[0]) % MOD
        for ch in s[1:]:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    assert code("b!xx") == code("a@xx") and "b!xx" != "a@xx"


def test_loser_set_matches_gate_oracle(spark, sf_dir):
    # end-to-end: python pairs + union-find reproduce the registered
    # row's recursive-CTE oracle output (via the Spark engine, which
    # the driver gate hash-verifies against that oracle)
    from rnadam_spark.queries.pipeline_q import paragraph_near_dups

    ref = _load_ref()
    expected = ref.expected_losers(sf_dir)
    got = {
        (r["doc_id"], r["para_idx"])
        for r in paragraph_near_dups(spark, sf_dir).collect()
    }
    assert got == expected and got
