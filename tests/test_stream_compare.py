"""The streamed digest compare in tools/check_correctness.py: the
scale path that verifies 10^8-row results without a driver collect.
Pins that the multiset digest (count, Σh, Σh² of per-row hashes) is
order-insensitive, multiplicity-sensitive, value-sensitive, and
dtype-canonical across the physical types Spark and DuckDB write for
the same logical values."""

from __future__ import annotations

import importlib.util
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _load_cc():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "check_correctness.py",
    )
    spec = importlib.util.spec_from_file_location("check_correctness", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["check_correctness"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cc():
    return _load_cc()


def _write(tmp_path, name, table):
    p = str(tmp_path / name)
    pq.write_table(table, p)
    return p


def test_digest_order_insensitive(cc, tmp_path):
    a = _write(tmp_path, "a.parquet", pa.table(
        {"k": ["x", "y", "z"], "v": [1, 2, 3]}))
    b = _write(tmp_path, "b.parquet", pa.table(
        {"v": [3, 1, 2], "k": ["z", "x", "y"]}))  # rows AND cols reordered
    da, db = cc._digest_parquet(a), cc._digest_parquet(b)
    assert da == db
    assert da["rows"] == 3 and da["cols"] == ["k", "v"]


def test_digest_value_and_multiplicity_sensitive(cc, tmp_path):
    base = _write(tmp_path, "base.parquet", pa.table(
        {"k": ["x", "y", "y"], "v": [1.5, 2.5, 2.5]}))
    one_off = _write(tmp_path, "off.parquet", pa.table(
        {"k": ["x", "y", "y"], "v": [1.5, 2.5, 2.5000001]}))
    shifted = _write(tmp_path, "shift.parquet", pa.table(
        {"k": ["x", "x", "y"], "v": [1.5, 1.5, 2.5]}))  # same set, diff counts
    d0 = cc._digest_parquet(base)
    assert cc._digest_parquet(one_off) != d0
    d2 = cc._digest_parquet(shifted)
    assert (d2["h1"], d2["h2"]) != (d0["h1"], d0["h2"])


def test_digest_canonicalizes_physical_types(cc, tmp_path):
    # same logical values, the physical flavors the two engines write:
    # int32 vs int64, float32 must NOT equal float64 of a different
    # value, tz-aware vs naive microsecond timestamps
    import datetime

    ts = [datetime.datetime(2026, 1, 1, 12, 0, 0, 123456)]
    a = _write(tmp_path, "ta.parquet", pa.table({
        "n": pa.array([7], type=pa.int32()),
        "t": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
    }))
    b = _write(tmp_path, "tb.parquet", pa.table({
        "n": pa.array([7], type=pa.int64()),
        "t": pa.array(ts, type=pa.timestamp("us")),
    }))
    assert cc._digest_parquet(a) == cc._digest_parquet(b)


def test_digest_rejects_nested(cc, tmp_path):
    p = _write(tmp_path, "nested.parquet", pa.table(
        {"a": pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))}))
    with pytest.raises(ValueError, match="scalar columns only"):
        cc._digest_parquet(p)


def test_digest_null_handling(cc, tmp_path):
    a = _write(tmp_path, "na.parquet", pa.table(
        {"s": ["x", None], "v": [1.0, None]}))
    b = _write(tmp_path, "nb.parquet", pa.table(
        {"s": [None, "x"], "v": [None, 1.0]}))
    c = _write(tmp_path, "nc.parquet", pa.table(
        {"s": ["x", None], "v": [None, 1.0]}))  # nulls on different rows
    assert cc._digest_parquet(a) == cc._digest_parquet(b)
    assert cc._digest_parquet(a) != cc._digest_parquet(c)
