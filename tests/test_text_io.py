"""JSONL interchange round-trip and cross-engine readability
(sources/text_io.py)."""

from __future__ import annotations

import glob
import os

import duckdb

from rnadam_spark.sources.tables import load_table
from rnadam_spark.sources.text_io import read_jsonl, write_jsonl


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out)
    assert back.schema == docs.schema
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b and a
    # gzip members written
    assert glob.glob(os.path.join(out, "*.gz"))


def test_jsonl_readable_by_duckdb(spark, sf_dir, tmp_path):
    # interchange means OTHER engines read it: DuckDB parses the same
    # files and agrees on every value
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_duck")
    write_jsonl(docs, out)
    con = duckdb.connect()
    got = con.execute(
        "SELECT doc_id, text, lang, source, n_chars "
        f"FROM read_json('{out}/*.gz', format='newline_delimited', "
        "columns={doc_id: 'BIGINT', text: 'VARCHAR', lang: 'VARCHAR', "
        "source: 'VARCHAR', n_chars: 'BIGINT'})"
    ).fetchall()
    assert set(got) == {tuple(r) for r in docs.collect()}


def test_jsonl_min_files_and_uncompressed(spark, tmp_path):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)], "doc_id BIGINT, text STRING").coalesce(1)
    out = str(tmp_path / "many")
    write_jsonl(df, out, compression=None, min_files=8)
    files = [f for f in glob.glob(os.path.join(out, "part-*")) if not f.endswith(".crc")]
    assert len(files) == 8
    back = read_jsonl(spark, out, schema="doc_id BIGINT, text STRING")
    assert back.count() == 100


def test_jsonl_failfast_on_corrupt(spark, tmp_path):
    import pytest

    src = tmp_path / "bad"
    src.mkdir()
    (src / "a.json").write_text('{"doc_id": 1, "text": "ok"}\n{not json}\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(src), schema="doc_id BIGINT, text STRING").collect()
    # PERMISSIVE quarantines instead
    ok = read_jsonl(
        spark, str(src),
        schema="doc_id BIGINT, text STRING, _corrupt_record STRING",
        mode="PERMISSIVE",
    ).collect()
    assert len(ok) == 2
    assert sum(1 for r in ok if r._corrupt_record is not None) == 1


def test_quarantine_split_and_sink(spark, tmp_path):
    from rnadam_spark.sources.text_io import read_jsonl_quarantine

    src = tmp_path / "mixed"
    src.mkdir()
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{mangled\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3}\n'  # legal JSON, missing keys -> clean with nulls
    )
    qdir = str(tmp_path / "quarantine")
    good, bad = read_jsonl_quarantine(spark, str(src), quarantine_path=qdir)
    g = {r.doc_id: r for r in good.collect()}
    assert set(g) == {1, 2, 3}
    assert g[3].text is None  # schema drift parses clean, not corrupt
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    b = bad.collect()
    assert [r.raw_record for r in b] == ["{mangled"]
    assert b[0].file.endswith("a.json")
    # quarantined lines land as replayable text
    lines = spark.read.text(qdir).collect()
    assert [r.value for r in lines] == ["{mangled"]


def test_quarantine_blank_lines_produce_no_phantom_rows(spark, tmp_path):
    """Blank/whitespace-only lines must vanish (as read.json does), not
    slip all-null rows into `good` via from_json's NULL struct."""
    from rnadam_spark.sources.text_io import read_jsonl_quarantine

    src = tmp_path / "blanks"
    src.mkdir()
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "\n"
        "   \n"
        "\t\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    good, bad = read_jsonl_quarantine(spark, str(src))
    g = good.collect()
    assert sorted(r.doc_id for r in g) == [1, 2]
    assert all(r.doc_id is not None for r in g)
    assert bad.count() == 0


def test_quarantine_null_struct_routes_to_bad(spark, tmp_path):
    """A non-blank line that parses to a NULL struct (JSON literal
    `null`) quarantines with its raw text instead of becoming a
    phantom good row."""
    from rnadam_spark.sources.text_io import read_jsonl_quarantine

    src = tmp_path / "nulls"
    src.mkdir()
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "null\n"
    )
    good, bad = read_jsonl_quarantine(spark, str(src))
    assert [r.doc_id for r in good.collect()] == [1]
    assert [r.raw_record for r in bad.collect()] == ["null"]


def test_quarantine_complex_ddl_column_names(spark, tmp_path):
    """Schemas with commas inside types (DECIMAL(10,2), MAP<K,V>) must
    still project the right column names — the DDL is parsed, not
    string-split."""
    from rnadam_spark.sources.text_io import read_jsonl_quarantine

    src = tmp_path / "complex"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "price": 10.25, "tags": {"k": 2}}\n'
    )
    good, bad = read_jsonl_quarantine(
        spark,
        str(src),
        schema="id BIGINT, price DECIMAL(10,2), tags MAP<STRING,INT>",
    )
    assert good.columns == ["id", "price", "tags"]
    r = good.collect()[0]
    assert (r.id, str(r.price), dict(r.tags)) == (1, "10.25", {"k": 2})
    assert bad.count() == 0
