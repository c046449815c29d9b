"""Pin the sf10 mpmath em_two_steps reference (tools/pyref_em_oracle.py)
against BOTH independent checks at a scale where everything is
feasible: the DuckDB gate oracle's rounded values, and the engine
itself through the tool's own grain-compare (which must classify every
row 'exact' on the small corpus — no boundary hits, no mismatches)."""

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
        "pyref_em_oracle.py",
    )
    spec = importlib.util.spec_from_file_location("pyref_em_oracle", path)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["pyref_em_oracle"] = ref  # ProcessPool pickles by module name
    spec.loader.exec_module(ref)
    return ref


def test_pyref_em_reference_matches_duckdb_oracle(sf_dir):
    from mpmath import mp, mpf

    from __spark_entry__ import oracle_sql

    ref = _load_ref()
    mp.dps = 50
    true_mu = ref.expected_em_two_steps(sf_dir)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(con.execute(oracle_sql()["em_two_steps"]).fetchall())
    assert set(want) == {str(d) for d in true_mu}
    n_boundary = 0
    for d, mu in true_mu.items():
        frac = mu * mpf(10) ** 8 + mpf("0.5")
        i_ref = int(frac)
        i_duck = int(want[str(d)] * 1e8 + 0.5)
        if i_duck == i_ref:
            continue
        # the DuckDB twin computes in doubles; a disagreement is only
        # legitimate hard against the half-boundary
        dist = min(frac - i_ref, i_ref + 1 - frac)
        assert abs(i_duck - i_ref) == 1 and dist < ref.BOUNDARY_TOL, (
            d, str(mu), want[str(d)])
        n_boundary += 1
    assert n_boundary <= len(true_mu) * 0.01  # boundary hits must be rare
