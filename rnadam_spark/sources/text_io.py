"""JSONL interchange source/sink for document corpora.

Raw pre-training data arrives and leaves as compressed JSON-lines far
more often than parquet (crawler dumps, tokenizer pipelines, dataset
releases), so the engine needs a first-class path in and out of that
format. Generalizes the reference's text sink S6 (the ``id, value``
``saveAsTextFile`` at rice-cli/.../cli/Quantify.scala:107-108) to a
schema-preserving round-trip.

Scale rules encoded here:

- **Reading requires an explicit schema.** ``spark.read.json`` without
  one runs a full inference pass over the data first — at 100 TB that
  doubles the read. Callers pass the DDL (default: the documents table
  shape).
- **Compression is per-file, so parallelism = file count.** gzip is not
  splittable: one 100 GB .json.gz is ONE task. The writer therefore
  inherits the upstream partitioning (one file per task) and the reader
  parallelizes across files; ``min_files`` guards against accidentally
  writing a handful of giant members.
- **Serialization stays JVM-side**: ``to_json(struct(...))`` /
  ``from_json`` are Catalyst expressions — no Python boundary on either
  direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    min_files: int | None = None,
) -> None:
    """Write rows as JSON-lines (one object per row, key order =
    column order). ``compression`` of None writes plain text;
    ``min_files`` repartitions up when the upstream plan would emit
    fewer files than that (non-splittable codecs make file count the
    read-side parallelism floor)."""
    from pyspark.sql import functions as F

    out = df
    if min_files is not None and df.rdd.getNumPartitions() < min_files:
        out = df.repartition(min_files)
    cols = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    writer = out.select(cols.alias("value")).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_DDL,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read JSON-lines with an EXPLICIT schema (no inference pass).
    ``mode`` defaults to FAILFAST — corrupt lines in training data
    should stop the job loudly; pass ``PERMISSIVE`` plus a
    ``_corrupt_record`` field in the schema to quarantine them
    instead. Compressed members (.gz/.bz2/.zst) decode transparently
    by extension."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_DDL,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): PERMISSIVE JSONL read with corrupt-record routing —
    the production middle ground between FAILFAST (one mangled crawler
    line kills a 100 TB ingest) and silently nulling bad rows.

    ``good`` carries exactly ``schema``'s columns for rows that parsed
    clean; ``bad`` carries (raw_record, file) for quarantine/replay.
    Both derive from ONE scan definition — Spark's PERMISSIVE mode puts
    the raw line in ``_corrupt_record`` and nulls the data columns, so
    the split is two filters on the same cached-free scan (each side
    prunes to its own columns; no shuffle, no second parse).

    A row counts as corrupt only when ``_corrupt_record`` is set; a row
    of legal JSON with missing keys parses clean with nulls (schema
    drift is the `corpus_diff` audit's job, not the parser's). Blank /
    whitespace-only lines are dropped before parsing (matching
    ``read.json``, which skips them — ``from_json`` would instead
    return a NULL struct whose null ``_corrupt_record`` slips an
    all-null phantom row into ``good``); any other line that still
    parses to a NULL struct routes to ``bad`` with its raw text. If
    ``quarantine_path`` is given the bad side is also written there as
    plain text for offline inspection/replay before `good` is consumed.

    Implementation note: the scan is ``read.text`` + ``from_json`` with
    a corrupt-record field, NOT ``read.json`` with PERMISSIVE — recent
    Spark disallows queries over a raw JSON scan that reference only
    ``_corrupt_record`` (the bad side does exactly that), while the
    expression form has no such restriction and parses identically."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    corrupt = "_corrupt_record"
    full = f"{schema}, {corrupt} STRING"
    raw = (
        spark.read.text(path)
        # rlike(\S), not trim(): Spark's trim strips only ASCII spaces,
        # so a tab-only line would survive and parse to a NULL struct
        .filter(F.col("value").rlike(r"\S"))
        .select(
            F.col("value"),
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
            ).alias("r"),
            F.input_file_name().alias("file"),
        )
    )
    # proper DDL parse (split-on-comma breaks on DECIMAL(10,2) / MAP<K,V>)
    data_cols = StructType.fromDDL(schema).fieldNames()
    good = raw.filter(
        F.col("r").isNotNull() & F.col(f"r.{corrupt}").isNull()
    ).select(*[F.col(f"r.{c}").alias(c) for c in data_cols])
    bad = raw.filter(
        F.col("r").isNull() | F.col(f"r.{corrupt}").isNotNull()
    ).select(
        F.coalesce(F.col(f"r.{corrupt}"), F.col("value")).alias("raw_record"),
        "file",
    )
    if quarantine_path is not None:
        bad.select("raw_record").write.mode("overwrite").text(quarantine_path)
    return good, bad
