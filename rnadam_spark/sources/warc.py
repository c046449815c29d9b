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

Deliberately "lite": records split on the blank-line +
``WARC/1.0`` sentinel rather than Content-Length byte accounting, so a
payload that embeds a verbatim WARC header block (an archived archive)
would over-split. Binary payloads pass through as text (Spark reads
wholetext as UTF-8 with replacement chars); pair with the multimodal
operators' binary asset tables when bytes must be exact.
"""

from __future__ import annotations

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
