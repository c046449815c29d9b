"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and (order-insensitively) values. Stricter than it needs to be on
floats: exact string-normalized equality, with an approximate fallback
reported separately — if only the approximate check passes, the query
needs explicit rounding on both sides.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from rnadam_spark.session import get_spark
from rnadam_spark.sources.tables import TABLES


def _norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "a:[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{k}={_norm(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def _approx_eq(a, b, rel=1e-7, abs_tol=1e-9):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=rel, abs_tol=abs_tol)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_approx_eq(x, y, rel, abs_tol) for x, y in zip(a, b))
    return _norm(a) == _norm(b)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    out = {"name": name, "rows_spark": len(spark_rows), "rows_oracle": len(duck_rows)}
    if sorted(spark_cols) != sorted(duck_cols):
        out["status"] = "SCHEMA_MISMATCH"
        out["spark_cols"], out["oracle_cols"] = sorted(spark_cols), sorted(duck_cols)
        return out
    if len(spark_rows) != len(duck_rows):
        out["status"] = "ROWCOUNT_MISMATCH"
        return out
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_norm = sorted(tuple(_norm(r[i]) for i in order) for r in spark_rows)
    d_norm = sorted(tuple(_norm(r[i]) for i in dorder) for r in duck_rows)
    if s_norm == d_norm:
        out["status"] = "OK"
        return out
    s_rows = sorted((tuple(r[i] for i in order) for r in spark_rows), key=lambda t: tuple(map(_norm, t)))
    d_rows = sorted((tuple(r[i] for i in dorder) for r in duck_rows), key=lambda t: tuple(map(_norm, t)))
    bad = [(a, b) for a, b in zip(s_rows, d_rows) if not _approx_eq(a, b)]
    if not bad:
        out["status"] = "APPROX_ONLY"  # needs rounding on both sides
        # show the first exact mismatch for context
        for a, b in zip(s_norm, d_norm):
            if a != b:
                out["example"] = {"spark": list(a), "oracle": list(b)}
                break
        return out
    out["status"] = "VALUE_MISMATCH"
    out["n_bad"] = len(bad)
    out["example"] = {"spark": [repr(x) for x in bad[0][0]], "oracle": [repr(x) for x in bad[0][1]]}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    # an in-memory DuckDB cannot spill, so scale-corpus oracles
    # (10^8-row shingle CTEs at sf10) die with OOM instead of going
    # out-of-core; a temp directory turns those into disk-backed runs
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='120GiB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results, failed = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "status": "SPARK_ERROR", "error": str(e)[:500]})
            failed += 1
            continue
        if name not in oracles:
            results.append({"name": name, "status": "NO_ORACLE", "rows_spark": len(spark_rows)})
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "status": "ORACLE_ERROR", "error": str(e)[:500]})
            failed += 1
            continue
        r = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        r["sec"] = round(time.time() - t0, 2)
        results.append(r)
        if r["status"] != "OK":
            failed += 1
    for r in results:
        print(json.dumps(r))
    print(f"\n{len(results) - failed}/{len(results)} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
