"""WARC (Web ARChive) ingestion — the crawl side of the pipeline.

Common Crawl and most in-house crawlers deliver WARC: concatenated
records, each a ``WARC/1.0`` header block, a blank line, and a payload
(for ``response`` records: the raw HTTP response, itself headers +
blank line + body). With :mod:`rnadam_spark.operators.html` this
completes the raw-crawl chain: WARC file → response records → HTML
body → ``extract_main_text`` → the documents table every downstream
curation operator consumes.

Parallelism model — the FASTQ argument again (``bio_formats.py``):
production WARC is .warc.gz (unsplittable; per-file parallel in every
engine), and record boundaries are only exactly recoverable by
honoring each record's Content-Length, which a split-based reader
cannot do mid-file. So the unit of work is the FILE: ``wholetext`` per
shard, in-row record splitting, header fields via ``regexp_extract`` —
all Catalyst expressions, no UDF, memory bounded by shard size (crawl
shards are sized ~1 GB for exactly this reason).

Two framing tiers:

- :func:`read_warc` (lite): records split on the blank-line +
  ``WARC/1.0`` sentinel — pure Catalyst expressions, zero Python. A
  payload that embeds a verbatim WARC header block (an archived
  archive) over-splits, and binary payloads pass through as UTF-8 with
  replacement chars. Right for the text/html path it feeds.
- :func:`read_warc_exact`: honors each record's ``Content-Length``
  with BYTE accounting over the raw (binaryFile) shard — an
  Arrow-batched per-shard splitter, the same sanctioned Python codec
  boundary as the BMP/WAV decodes (``operators/multimodal.py``). An
  archived-archive payload stays ONE record; per-shard suspect-record
  counts ride the output (``n_suspect``, the FASTQ malformed-framing
  guard pattern); records without a Content-Length fall back to
  sentinel splitting within the same walk. Gzip members decompress in
  the splitter (binaryFile hands over raw bytes), so ``.warc.gz``
  works identically.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# record separator: blank line then the next record's version line
_RECORD_SEP = r"(?:\r?\n){2,}WARC/1\.[01]\r?\n"
_LEADING_VERSION = r"^WARC/1\.[01]\r?\n"
_BLANK = r"\r?\n\r?\n"


def _header(headers: Column, name: str) -> Column:
    """Value of a WARC/HTTP header line (case-insensitive name match),
    null when absent."""
    v = F.regexp_extract(headers, f"(?im)^{name}:\\s*([^\\r\\n]*)", 1)
    return F.when(F.length(v) > 0, F.trim(v))


def warc_records(raw: DataFrame) -> DataFrame:
    """(warc_type, target_uri, warc_date, content_type, payload,
    source_file) from a (source_file, value) frame holding one WHOLE
    WARC file per row — the shared parsing kernel behind
    :func:`read_warc` (batch) and :func:`read_warc_stream`
    (incremental ingest). Pure projection + explode: stateless, so it
    runs identically on a file stream."""
    body = F.regexp_replace(F.col("value"), _LEADING_VERSION, "")
    records = F.split(body, _RECORD_SEP)

    def fields(rec: Column) -> Column:
        # try_element_at: a degenerate record with no blank line after
        # its headers yields a null payload instead of an ANSI index
        # error (evaluation order inside codegen stages is not
        # guaranteed to respect the warc_type filter)
        headers = F.try_element_at(F.split(rec, _BLANK, 2), F.lit(1))
        payload = F.try_element_at(F.split(rec, _BLANK, 2), F.lit(2))
        return F.struct(
            _header(headers, "WARC-Type").alias("warc_type"),
            _header(headers, "WARC-Target-URI").alias("target_uri"),
            _header(headers, "WARC-Date").alias("warc_date"),
            _header(headers, "Content-Type").alias("content_type"),
            payload.alias("payload"),
        )

    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select("source_file", F.explode(F.transform(records, fields)).alias("r"))
        .filter(F.col("r.warc_type").isNotNull())
        .select(
            "r.warc_type",
            "r.target_uri",
            "r.warc_date",
            "r.content_type",
            "r.payload",
            "source_file",
        )
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Batch entry: every WARC record in the file(s) at ``path``.
    ``payload`` is the raw record block after the WARC header's blank
    line (for responses: the full HTTP response). One wholetext row per
    file, then the in-row :func:`warc_records` kernel — no shuffle."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source_file"), "value"
    )
    return warc_records(raw)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming entry: WARC shards arriving in ``path`` parse through
    the same stateless kernel — pair with
    ``operators.html.extract_main_text`` (also stateless) for a
    checkpointed incremental crawl-ingest query (use
    ``trigger(availableNow=True)`` for batch-cadence runs; each run
    processes exactly the shards that arrived since the last)."""
    raw = spark.readStream.text(path, wholetext=True).select(
        F.input_file_name().alias("source_file"), "value"
    )
    return warc_records(raw)


# ------------------------------------------------ exact framing

_WARC_EXACT_SCHEMA = (
    "warc_type string, target_uri string, warc_date string, "
    "content_type string, payload string, source_file string, n_suspect bigint"
)

_CONTENT_LENGTH_RE = re.compile(rb"(?im)^content-length:[ \t]*(\d+)[ \t]*$")


def _hfield(headers: str, name: str) -> str | None:
    m = re.search(rf"(?im)^{name}:\s*([^\r\n]*)", headers)
    if m:
        v = m.group(1).strip()
        return v or None
    return None


def _split_warc_exact(data: bytes) -> tuple[list[tuple[bytes, bytes]], int]:
    """((headers, payload) per record, suspect count) by walking the
    byte stream: version line → header block → blank line →
    Content-Length payload bytes. Suspect events: leading/inter-record
    garbage, a truncated payload, a header block with no terminating
    blank line, or a record missing WARC-Type. On any of them the walk
    resyncs at the next line-initial ``WARC/1.`` and keeps going —
    one mangled record must never drop the rest of a 1 GB shard."""
    n = len(data)

    def next_version(start: int) -> int:
        i = data.find(b"WARC/1.", start)
        while i != -1 and i > 0 and data[i - 1 : i] != b"\n":
            i = data.find(b"WARC/1.", i + 1)
        return i

    recs: list[tuple[bytes, bytes]] = []
    n_suspect = 0
    pos = next_version(0)
    if pos == -1:
        return [], (1 if data.strip() else 0)
    if data[:pos].strip():
        n_suspect += 1  # bytes before the first record
    while pos != -1 and pos < n:
        he_crlf = data.find(b"\r\n\r\n", pos)
        he_lf = data.find(b"\n\n", pos)
        ends = [e for e in (he_crlf, he_lf) if e != -1]
        if not ends:
            n_suspect += 1  # header block never terminates
            break
        he = min(ends)
        headers = data[pos:he]
        body_start = he + (4 if he == he_crlf else 2)
        m = _CONTENT_LENGTH_RE.search(headers)
        if m:
            end = body_start + int(m.group(1))
            if end > n:
                n_suspect += 1  # payload truncated by shard end
                recs.append((headers, data[body_start:]))
                break
            recs.append((headers, data[body_start:end]))
            nxt = next_version(end)
            gap = data[end : nxt if nxt != -1 else n]
            if gap.strip():
                n_suspect += 1  # non-blank bytes between records
            pos = nxt
        else:
            # no Content-Length: sentinel fallback for THIS record
            nxt = next_version(body_start)
            payload = data[body_start : nxt if nxt != -1 else n]
            recs.append((headers, payload.rstrip(b"\r\n")))
            pos = nxt
    return recs, n_suspect


def warc_records_exact(raw: DataFrame) -> DataFrame:
    """Content-Length-exact twin of :func:`warc_records` over a
    (source_file, content BINARY) frame — one whole raw shard per row.
    Arrow-batched ``mapInPandas``; peak memory is one batch of shards
    per task, and parallelism is file count, exactly like the lite
    path. Adds ``n_suspect``: the shard's malformed-framing event
    count, constant across the shard's rows (aggregate with
    ``first``); a shard that yields NO records but has suspect bytes
    emits one all-null row carrying the count so the audit never loses
    it (filter ``warc_type IS NOT NULL`` for content work, as the lite
    reader's output already implies)."""
    import pandas as pd

    cols = (
        "warc_type", "target_uri", "warc_date",
        "content_type", "payload", "source_file", "n_suspect",
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for sf, content in zip(pdf["source_file"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                recs, n_suspect = _split_warc_exact(data)
                emitted = 0
                rows = []
                for h_bytes, p_bytes in recs:
                    headers = h_bytes.decode("utf-8", errors="replace")
                    wt = _hfield(headers, "WARC-Type")
                    if wt is None:
                        n_suspect += 1  # framing ok, record nonsense
                        continue
                    rows.append((
                        wt,
                        _hfield(headers, "WARC-Target-URI"),
                        _hfield(headers, "WARC-Date"),
                        _hfield(headers, "Content-Type"),
                        p_bytes.decode("utf-8", errors="replace"),
                    ))
                    emitted += 1
                if emitted == 0 and n_suspect > 0:
                    rows.append((None, None, None, None, None))
                for r in rows:
                    for c, v in zip(cols, (*r, sf, n_suspect)):
                        out[c].append(v)
            yield pd.DataFrame(out)

    return raw.mapInPandas(parse, _WARC_EXACT_SCHEMA)


#: binaryFile's fixed schema, spelled out for the streaming reader
#: (streaming sources require an explicit schema).
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_exact(spark: SparkSession, path: str) -> DataFrame:
    """Batch entry for the exact tier: binaryFile scan (raw bytes, no
    JVM text decode) → :func:`warc_records_exact`. Schema is the lite
    reader's plus ``n_suspect``, so :func:`html_responses` composes
    unchanged."""
    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("source_file"), "content"
    )
    return warc_records_exact(raw)


def read_warc_exact_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc_exact`: raw shards arriving
    in ``path`` parse through the same stateless Arrow-batched splitter
    (the split is per-shard, so it needs no state store), giving the
    incremental crawl-ingest path Content-Length-exact framing and the
    per-shard ``n_suspect`` audit column. Pair with
    ``trigger(availableNow=True)`` for batch-cadence runs."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
        .select(F.col("path").alias("source_file"), "content")
    )
    return warc_records_exact(raw)


def html_responses(warc: DataFrame) -> DataFrame:
    """(doc_id, url, fetched_at, html) from a :func:`read_warc` table:
    keep ``response`` records whose HTTP Content-Type is text/html,
    strip the HTTP status line + headers (everything through the first
    blank line), and mint a deterministic 64-bit doc_id from
    (canonical url, fetch date) — canonicalizing first
    (``web.canonical_url``) so two fetches of the same page that differ
    only in tracking params / fragment / www. collide, the identity
    downstream dedup and diffing key on. ``url`` keeps the raw form.
    Feed the result straight to ``operators.html.extract_main_text``."""
    from rnadam_spark.operators.web import canonical_url

    http_headers = F.try_element_at(F.split(F.col("payload"), _BLANK, 2), F.lit(1))
    http_body = F.try_element_at(F.split(F.col("payload"), _BLANK, 2), F.lit(2))
    http_content_type = _header(http_headers, "Content-Type")
    return (
        warc.filter(F.col("warc_type") == "response")
        .withColumn("_hct", F.lower(F.coalesce(http_content_type, F.lit(""))))
        .filter(F.col("_hct").contains("text/html"))
        .select(
            F.xxhash64(canonical_url(F.col("target_uri")), F.col("warc_date")).alias(
                "doc_id"
            ),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.coalesce(http_body, F.lit("")).alias("html"),
        )
    )
