"""Genomics pipeline sources and sinks (SURVEY.md §2.1 S1–S6).

The reference's ADAM loaders and Parquet-Avro scans/saves
(rice-cli/.../cli/Index.scala:60-93, cli/Quantify.scala:73-94) become
plain parquet reads/writes with explicit schemas — Catalyst pushdown and
pruning replace the hand-rolled ParquetInputFormat plumbing, and the
Avro IDL schemas (rice-schemas/.../rice.avdl) become the StructTypes in
``rnadam_spark.schemas``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rnadam_spark import schemas


def load_reads(spark: SparkSession, path: str) -> DataFrame:
    """S1: reads — only (read_id, sequence) are carried; the reference
    materialized full AlignmentRecords and used one field."""
    return spark.read.schema(schemas.READS).parquet(path)


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """S2: transcript descriptors with nested exons."""
    return spark.read.schema(schemas.TRANSCRIPTS).parquet(path)


def load_genome(spark: SparkSession, path: str) -> DataFrame:
    """S3: genome as a (contig, sequence) dimension table — replaces the
    driver-local TwoBitFile random-access store; extraction happens via
    broadcast join + substring (Index P1)."""
    return spark.read.schema(schemas.GENOME).parquet(path)


def save_index(kmer_to_class: DataFrame, class_kmers: DataFrame, out: str) -> None:
    """S5: persist the bidirectional index as two parquet datasets,
    mirroring the reference's ``<out>_kmers`` / ``<out>_classes`` pair
    (cli/Index.scala:77-93), plus ``<out>_contents`` in the declared
    nested ClassContents shape (rice.avdl:23-31:
    ``{equivalenceClass, array<string> kmers}``) — the flat form is the
    join/agg surface; the nested form is schema parity at the edge only
    (collect_list + sort_array, SURVEY.md §1.4)."""
    kmer_to_class.write.mode("overwrite").parquet(out + "_kmers")
    class_kmers.write.mode("overwrite").parquet(out + "_classes")
    (
        class_kmers.groupBy("class_id")
        .agg(F.sort_array(F.collect_list("kmer")).alias("kmers"))
        .write.mode("overwrite")
        .parquet(out + "_contents")
    )


def load_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S4: re-load the index pair (cli/Quantify.scala:76-90)."""
    return (
        spark.read.schema(schemas.KMER_TO_CLASS).parquet(path + "_kmers"),
        spark.read.schema(schemas.CLASS_KMERS).parquet(path + "_classes"),
    )


def save_abundances_text(result: DataFrame, out: str) -> None:
    """S6: text sink — ``"<id>, <coverage>"`` lines, matching the
    reference's saveAsTextFile format (cli/Quantify.scala:107-108)."""
    result.select(
        F.concat_ws(", ", F.col("t_id"), F.col("abundance").cast("string"))
    ).write.mode("overwrite").text(out)


def save_abundances_parquet(result: DataFrame, out: str) -> None:
    result.select("t_id", "abundance").write.mode("overwrite").parquet(out)
