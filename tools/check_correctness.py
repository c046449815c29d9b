"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and (order-insensitively) values. Stricter than it needs to be on
floats: exact string-normalized equality, with an approximate fallback
reported separately — if only the approximate check passes, the query
needs explicit rounding on both sides.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
       python tools/check_correctness.py --stream [sf_dir] [name ...]

``--stream`` switches to the scale-safe compare: instead of collecting
both result sets to driver lists (infeasible at 10^8 rows), Spark
writes its result to parquet DISTRIBUTEDLY, DuckDB COPYs the oracle to
parquet out-of-core, and both files stream through the same
record-batch digest — an order-insensitive multiset hash (count + sum
and sum-of-squares of per-row 64-bit hashes, mod 2^64) whose memory is
bounded by one batch regardless of row count. Both sides hash in the
same process through the same code path, so the digest needs no
cross-engine hash compatibility; equal digests certify multiset
equality up to 2^-64-scale collision odds. Scalar columns only (ints,
floats, strings, bools, timestamps) — list/struct results raise and
should use the collect path at a feasible scale instead.
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


def _digest_parquet(path: str) -> dict:
    """Order-insensitive multiset digest of a parquet result set.

    Streams record batches (bounded memory at any row count),
    canonicalizes dtypes so logically-equal values hash equally
    regardless of which engine wrote the file (all ints → int64, all
    floats → float64, string flavors → object), sorts columns by name
    (the same convention as the collect-path compare), and combines
    per-row hashes commutatively: count, Σh mod 2^64, Σh² mod 2^64.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    names = sorted(dataset.schema.names)
    for field in dataset.schema:
        if pa.types.is_nested(field.type):
            raise ValueError(
                f"streamed digest supports scalar columns only; "
                f"{field.name} is {field.type}"
            )
    count, h1, h2 = 0, 0, 0
    for batch in dataset.to_batches(batch_size=1 << 20, columns=names):
        if batch.num_rows == 0:
            continue
        pdf = batch.to_pandas()
        for c in pdf.columns:
            dt = pdf[c].dtype
            if isinstance(dt, pd.DatetimeTZDtype):
                # Spark writes isAdjustedToUTC=true, DuckDB writes
                # naive — same instant must hash the same
                pdf[c] = (
                    pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
                    .astype("datetime64[us]")
                )
            elif pd.api.types.is_datetime64_any_dtype(dt):
                pdf[c] = pdf[c].astype("datetime64[us]")
            elif pd.api.types.is_integer_dtype(dt):
                pdf[c] = pdf[c].astype("int64")
            elif pd.api.types.is_float_dtype(dt):
                pdf[c] = pdf[c].astype("float64")
        hv = pd.util.hash_pandas_object(pdf, index=False).to_numpy(dtype=np.uint64)
        count += len(hv)
        h1 = (h1 + int(hv.sum(dtype=np.uint64))) & 0xFFFFFFFFFFFFFFFF
        h2 = (h2 + int((hv * hv).sum(dtype=np.uint64))) & 0xFFFFFFFFFFFFFFFF
    return {"rows": count, "cols": names, "h1": h1, "h2": h2}


def stream_compare(name, fn, sql, spark, sf_dir, con) -> dict:
    """Scale-safe compare: both sides land in parquet (Spark writes
    distributed, DuckDB out-of-core), then stream through the same
    digest. No driver-side collect anywhere."""
    import shutil
    import tempfile

    out = {"name": name, "mode": "stream"}
    tmp = tempfile.mkdtemp(prefix=f"ccstream_{name}_", dir="/tmp")
    try:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").parquet(f"{tmp}/spark")
        out["sec_spark"] = round(time.time() - t0, 2)
        t0 = time.time()
        con.execute(
            f"COPY ({sql.rstrip().rstrip(';')}) TO '{tmp}/oracle.parquet' "
            f"(FORMAT PARQUET)"
        )
        out["sec_oracle"] = round(time.time() - t0, 2)
        t0 = time.time()
        s = _digest_parquet(f"{tmp}/spark")
        d = _digest_parquet(f"{tmp}/oracle.parquet")
        out["sec_digest"] = round(time.time() - t0, 2)
        out["rows_spark"], out["rows_oracle"] = s["rows"], d["rows"]
        if s["cols"] != d["cols"]:
            out["status"] = "SCHEMA_MISMATCH"
            out["spark_cols"], out["oracle_cols"] = s["cols"], d["cols"]
        elif s["rows"] != d["rows"]:
            out["status"] = "ROWCOUNT_MISMATCH"
        elif (s["h1"], s["h2"]) != (d["h1"], d["h2"]):
            out["status"] = "VALUE_MISMATCH"
            out["digest_spark"] = [s["h1"], s["h2"]]
            out["digest_oracle"] = [d["h1"], d["h2"]]
        else:
            out["status"] = "OK"
            out["digest"] = [s["h1"], s["h2"]]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main():
    argv = sys.argv[1:]
    stream = "--stream" in argv
    if stream:
        argv.remove("--stream")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    # an in-memory DuckDB cannot spill, so scale-corpus oracles
    # (10^8-row shingle CTEs at sf10) die with OOM instead of going
    # out-of-core; a temp directory turns those into disk-backed runs
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    # below the host's free-disk headroom: a runaway oracle spill must
    # error (caught per-query) rather than fill /tmp under Spark's
    # shuffle dirs
    con.execute("SET max_temp_directory_size='55GiB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results, failed = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if stream:
            if name not in oracles:
                results.append({"name": name, "status": "NO_ORACLE", "mode": "stream"})
                continue
            try:
                r = stream_compare(name, fn, oracles[name], spark, sf_dir, con)
            except Exception as e:  # noqa: BLE001
                r = {"name": name, "status": "STREAM_ERROR", "error": str(e)[:500]}
            results.append(r)
            if r["status"] != "OK":
                failed += 1
            print(json.dumps(r), flush=True)
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
    if not stream:  # stream mode prints each row as it completes
        for r in results:
            print(json.dumps(r))
    print(f"\n{len(results) - failed}/{len(results)} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
