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
