"""Explicit StructTypes for the genomics pipeline tables.

Replaces the reference's Avro IDL schemas
(rice-schemas/src/main/resources/avro/rice.avdl:23-31 — KmerToClass,
ClassContents) and ADAM's record types with flat, Parquet-friendly
DataFrame schemas (SURVEY.md §1.4). Flat tables first; arrays only at
the edges (nested ``exons`` kept for the transcript descriptor, with a
flat ``exons`` twin for SQL-oracle checks — FIXTURES.md A2).
"""

from __future__ import annotations

from pyspark.sql import types as T

READS = T.StructType(
    [
        T.StructField("read_id", T.LongType(), False),
        T.StructField("sequence", T.StringType(), False),
    ]
)

GENOME = T.StructType(
    [
        T.StructField("contig", T.StringType(), False),
        T.StructField("sequence", T.StringType(), False),
    ]
)

EXON = T.StructType(
    [
        T.StructField("exon_id", T.StringType(), False),
        T.StructField("contig", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)

TRANSCRIPTS = T.StructType(
    [
        T.StructField("t_id", T.StringType(), False),
        T.StructField("gene_id", T.StringType(), True),
        T.StructField("strand", T.BooleanType(), True),
        T.StructField("exons", T.ArrayType(EXON), False),
    ]
)

# class_id is a 128-bit content hash (md5 hex of the defining
# (t_id, cnt) signature) — a 64-bit hash's birthday bound stops being
# negligible at billions of classes, and the reference's zipWithUniqueId
# LongType IDs (rice.avdl:25) were layout-dependent anyway.
KMER_TO_CLASS = T.StructType(
    [
        T.StructField("kmer", T.StringType(), False),
        T.StructField("class_id", T.StringType(), False),
    ]
)

CLASS_KMERS = T.StructType(
    [
        T.StructField("class_id", T.StringType(), False),
        T.StructField("kmer", T.StringType(), False),
    ]
)

CLASS_CONTENTS = T.StructType(
    [
        T.StructField("class_id", T.StringType(), False),
        T.StructField("kmers", T.ArrayType(T.StringType()), False),
    ]
)

CLASS_TRANSCRIPTS = T.StructType(
    [
        T.StructField("class_id", T.StringType(), False),
        T.StructField("t_id", T.StringType(), False),
    ]
)

KMER_COUNTS = T.StructType(
    [
        T.StructField("kmer", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)

ABUNDANCE = T.StructType(
    [
        T.StructField("t_id", T.StringType(), False),
        T.StructField("abundance", T.DoubleType(), False),
    ]
)
