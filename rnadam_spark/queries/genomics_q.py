"""Reference-parity operators re-targeted onto the driver's tables.

The reference pipeline's hottest path is k-mer counting → class mapping
(rice-core/.../algorithms/Quantify.scala:58-72). The driver's oracle
tables carry no genomic reads, so for the hash-checked correctness gate
these operators run over ``documents.text`` — same operator semantics
(shingle → explode → count → join → roll-up), different alphabet. The
genomic pipeline itself (Index/Quantify/Tare over A-fixtures) lives in
``rnadam_spark.algorithms`` with its own golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rnadam_spark.functions.shingles import char_shingles
from rnadam_spark.registry import query
from rnadam_spark.sources.tables import load_table

K = 5  # shingle width for the documents-table analogs


def _kmers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(char_shingles("text", K)).alias("kmer"))


# DuckDB can't lateral-join generate_series on a column; unnest(range())
# in the select list expands rows instead (empty range → row dropped,
# matching char_shingles' empty array under explode).
_KMERS_SQL = f"""
SELECT doc_id, substring(text, CAST(i AS INT), {K}) AS kmer
FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - {K - 1}, 0) + 1)) AS i
      FROM documents)
"""


@query(
    "kmer_count",
    oracle=f"""
    SELECT kmer, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_KMERS_SQL})
    GROUP BY kmer
    """,
)
def kmer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (word count over shingles): Quantify.scala:58-60 / adamCountKmers.

    explode(shingles) → groupBy → count: Catalyst plans a partial
    (map-side) HashAggregate before the shuffle, so the shuffle carries
    one row per distinct k-mer per task — the same shape reduceByKey
    gave the reference, with codegen.
    """
    return _kmers(spark, sf_dir).groupBy("kmer").agg(F.count("*").alias("cnt"))
