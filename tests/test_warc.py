"""WARC ingestion (sources/warc.py): record splitting, header parsing,
HTML response extraction, and the full crawl chain into
extract_main_text."""

from __future__ import annotations

from rnadam_spark.operators.html import extract_main_text
from rnadam_spark.sources import warc as W

CRLF = "\r\n"

HTML_BODY = (
    "<html><head><title>T</title></head><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>A</a> <a href='/b'>B</a></nav>"
    "<p>The quick brown fox jumps over the lazy dog and the crowd is amazed "
    "at the sight of it.</p></body></html>"
)


def _record(headers: dict, payload: str) -> str:
    head = CRLF.join(f"{k}: {v}" for k, v in headers.items())
    return f"WARC/1.0{CRLF}{head}{CRLF}{CRLF}{payload}"


def _warc_file() -> str:
    info = _record(
        {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
        f"software: test-crawler{CRLF}",
    )
    request = _record(
        {
            "WARC-Type": "request",
            "WARC-Target-URI": "http://example.com/page",
            "Content-Type": "application/http; msgtype=request",
        },
        f"GET /page HTTP/1.1{CRLF}Host: example.com{CRLF}",
    )
    response = _record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "http://example.com/page",
            "WARC-Date": "2026-08-14T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        f"HTTP/1.1 200 OK{CRLF}Content-Type: text/html; charset=utf-8{CRLF}{CRLF}{HTML_BODY}",
    )
    binary = _record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "http://example.com/logo.png",
            "WARC-Date": "2026-08-14T00:00:01Z",
            "Content-Type": "application/http; msgtype=response",
        },
        f"HTTP/1.1 200 OK{CRLF}Content-Type: image/png{CRLF}{CRLF}PNGBYTES",
    )
    return (CRLF + CRLF).join([info, request, response, binary]) + CRLF + CRLF


def test_read_warc_records(spark, tmp_path):
    p = tmp_path / "crawl.warc"
    p.write_text(_warc_file())
    rows = W.read_warc(spark, str(p)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "request", "response", "response"]
    resp = rows[2]
    assert resp.target_uri == "http://example.com/page"
    assert resp.warc_date == "2026-08-14T00:00:00Z"
    assert resp.payload.startswith("HTTP/1.1 200 OK")
    assert HTML_BODY in resp.payload


def test_html_responses_and_extraction_chain(spark, tmp_path):
    p = tmp_path / "crawl.warc"
    p.write_text(_warc_file())
    pages = W.html_responses(W.read_warc(spark, str(p)))
    rows = pages.collect()
    # only the text/html response survives; the PNG and request do not
    assert len(rows) == 1
    assert rows[0].url == "http://example.com/page"
    assert rows[0].html == HTML_BODY
    assert isinstance(rows[0].doc_id, int)

    text = extract_main_text(pages).collect()[0]
    assert "quick brown fox" in text.main_text
    assert "Home" not in text.main_text  # nav boilerplate dropped


def test_read_warc_deterministic_ids(spark, tmp_path):
    p = tmp_path / "crawl.warc"
    p.write_text(_warc_file())
    a = W.html_responses(W.read_warc(spark, str(p))).collect()[0].doc_id
    b = W.html_responses(W.read_warc(spark, str(p)).repartition(3)).collect()[0].doc_id
    assert a == b


def test_cli_warc_extract(spark, tmp_path):
    from pyspark.sql import functions as F

    from rnadam_spark import cli

    p = tmp_path / "crawl.warc"
    p.write_text(_warc_file())
    out = str(tmp_path / "docs.parquet")
    cli.main(["warc-extract", str(p), out, "-drop_empty"])
    docs = spark.read.parquet(out)
    rows = docs.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url == "http://example.com/page"
    assert r.fetched_at == "2026-08-14T00:00:00Z"
    assert "quick brown fox" in r.text and "Home" not in r.text
    # single scan: the plan has no join back onto the parse subtree
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_warc_stream_matches_batch(spark, tmp_path):
    # the full crawl chain (WARC parse -> html responses -> main-text
    # extraction) is stateless, so the streaming twin over the same
    # shard directory must emit exactly the batch rows
    from rnadam_spark.streaming.events import run_to_memory

    d = tmp_path / "shards"
    d.mkdir()
    (d / "a.warc").write_text(_warc_file())
    (d / "b.warc").write_text(_warc_file().replace("example.com", "other.org"))

    def chain(warc_df):
        return extract_main_text(
            W.html_responses(warc_df), out_col="text", carry=("url",)
        )

    got = run_to_memory(chain(W.read_warc_stream(spark, str(d))), "warc_stream_out")
    stream_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in chain(W.read_warc(spark, str(d))).collect()}
    assert stream_rows == batch_rows
    assert {r[1] for r in stream_rows} == {
        "http://example.com/page", "http://other.org/page"
    }


def test_read_warc_gzip_shard(spark, tmp_path):
    # production WARC is .warc.gz; the wholetext read must decompress
    # transparently (codec by extension) and parse identically
    import gzip

    p = tmp_path / "crawl.warc.gz"
    with gzip.open(p, "wt") as f:
        f.write(_warc_file())
    rows = W.read_warc(spark, str(p)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "request", "response", "response"]
    pages = W.html_responses(W.read_warc(spark, str(p))).collect()
    assert len(pages) == 1 and pages[0].html == HTML_BODY


def test_html_response_ids_collapse_tracking_variants(spark, tmp_path):
    # two fetches of the same page differing only in a utm param mint
    # the SAME doc_id (canonical-url identity); a different page differs
    raw = _warc_file()
    variant = raw.replace(
        "WARC-Target-URI: http://example.com/page",
        "WARC-Target-URI: http://www.example.com/page?utm_source=feed",
    )
    (tmp_path / "a.warc").write_text(raw)
    (tmp_path / "b.warc").write_text(variant)
    pages = W.html_responses(W.read_warc(spark, str(tmp_path))).collect()
    ids = {r.url: r.doc_id for r in pages}
    assert len(ids) == 2
    assert len(set(ids.values())) == 1  # same page -> same id
