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


def _record_cl(headers: dict, payload: str) -> str:
    """Spec-shaped record WITH Content-Length byte accounting."""
    h = dict(headers)
    h["Content-Length"] = str(len(payload.encode()))
    head = CRLF.join(f"{k}: {v}" for k, v in h.items())
    return f"WARC/1.0{CRLF}{head}{CRLF}{CRLF}{payload}{CRLF}{CRLF}"


def _exact_warc_file(embed_archive: bool = False) -> str:
    inner = _record_cl(
        {"WARC-Type": "response", "WARC-Target-URI": "http://inner.example/x"},
        "HTTP/1.1 200 OK\r\n\r\ninner-body",
    )
    payload3 = (
        f"HTTP/1.1 200 OK{CRLF}Content-Type: text/html{CRLF}{CRLF}"
        + (inner if embed_archive else HTML_BODY)
    )
    return (
        _record_cl(
            {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
            f"software: test-crawler{CRLF}",
        )
        + _record_cl(
            {
                "WARC-Type": "request",
                "WARC-Target-URI": "http://example.com/page",
            },
            f"GET /page HTTP/1.1{CRLF}Host: example.com{CRLF}",
        )
        + _record_cl(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "http://example.com/page",
                "WARC-Date": "2026-08-14T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            payload3,
        )
    )


def test_read_warc_exact_wellformed_and_composes(spark, tmp_path):
    p = tmp_path / "exact.warc"
    p.write_text(_exact_warc_file())
    rows = W.read_warc_exact(spark, str(p)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "request", "response"]
    assert all(r.n_suspect == 0 for r in rows)
    resp = rows[2]
    assert resp.target_uri == "http://example.com/page"
    assert HTML_BODY in resp.payload
    # html_responses composes unchanged on the exact table
    pages = W.html_responses(W.read_warc_exact(spark, str(p))).collect()
    assert len(pages) == 1 and pages[0].html == HTML_BODY


def test_read_warc_exact_archived_archive_stays_one_record(spark, tmp_path):
    # a response whose payload is itself a verbatim WARC record: the
    # sentinel reader over-splits it; Content-Length accounting doesn't
    p = tmp_path / "nested.warc"
    p.write_text(_exact_warc_file(embed_archive=True))
    exact = W.read_warc_exact(spark, str(p)).collect()
    assert [r.warc_type for r in exact] == ["warcinfo", "request", "response"]
    assert all(r.n_suspect == 0 for r in exact)
    assert "http://inner.example/x" in exact[2].payload  # intact inside
    lite = W.read_warc(spark, str(p)).collect()
    assert len(lite) > 3  # documented over-split of the lite tier


def test_read_warc_exact_gzip_shard(spark, tmp_path):
    import gzip

    p = tmp_path / "exact.warc.gz"
    with gzip.open(p, "wt") as f:
        f.write(_exact_warc_file())
    rows = W.read_warc_exact(spark, str(p)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "request", "response"]
    assert HTML_BODY in rows[2].payload


def test_read_warc_exact_counts_suspect_and_resyncs(spark, tmp_path):
    # garbage between records + a lying Content-Length: both counted,
    # and the walk resyncs so the following record still parses
    good_tail = _record_cl(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "http://example.com/tail",
            "WARC-Date": "2026-08-14T00:00:02Z",
            "Content-Type": "application/http; msgtype=response",
        },
        f"HTTP/1.1 200 OK{CRLF}Content-Type: text/html{CRLF}{CRLF}{HTML_BODY}",
    )
    lying = (
        f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
        f"WARC-Target-URI: http://example.com/liar{CRLF}"
        f"Content-Length: 3{CRLF}{CRLF}"
        f"abcdef-not-three-bytes{CRLF}{CRLF}"
    )
    p = tmp_path / "sus.warc"
    p.write_text("garbage preamble\r\n\r\n" + lying + good_tail)
    rows = W.read_warc_exact(spark, str(p)).collect()
    types = [r.warc_type for r in rows]
    assert types.count("response") == 2  # liar truncated but kept; tail intact
    tail = [r for r in rows if r.target_uri == "http://example.com/tail"][0]
    assert HTML_BODY in tail.payload
    # preamble garbage + post-payload junk after the lying record
    assert rows[0].n_suspect == 2


def test_warc_exact_stream_matches_batch(spark, tmp_path):
    # the exact tier's streaming twin (binaryFile stream -> the same
    # stateless Arrow-batched splitter) emits exactly the batch rows
    from rnadam_spark.streaming.events import run_to_memory

    d = tmp_path / "shards"
    d.mkdir()
    (d / "a.warc").write_text(_exact_warc_file())
    (d / "b.warc").write_text(_exact_warc_file().replace("example.com", "other.org"))

    got = run_to_memory(W.read_warc_exact_stream(spark, str(d)), "warc_exact_stream")
    # source_file URI forms may differ between scan paths — compare on
    # the content fields + the basename
    import os

    def key(r):
        return (r.warc_type, r.target_uri, r.warc_date, r.content_type,
                r.payload, os.path.basename(r.source_file), r.n_suspect)

    stream_rows = {key(r) for r in got.collect()}
    batch_rows = {key(r) for r in W.read_warc_exact(spark, str(d)).collect()}
    assert stream_rows == batch_rows and len(stream_rows) == 6


def test_read_warc_exact_sentinel_fallback_matches_lite(spark, tmp_path):
    # records WITHOUT Content-Length walk by the sentinel inside the
    # exact reader and agree with the lite tier field-for-field
    p = tmp_path / "nocl.warc"
    p.write_text(_warc_file())
    exact = {
        (r.warc_type, r.target_uri, r.warc_date, (r.payload or "").rstrip("\r\n"))
        for r in W.read_warc_exact(spark, str(p)).collect()
    }
    lite = {
        (r.warc_type, r.target_uri, r.warc_date, (r.payload or "").rstrip("\r\n"))
        for r in W.read_warc(spark, str(p)).collect()
    }
    assert exact == lite and len(exact) == 4


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
