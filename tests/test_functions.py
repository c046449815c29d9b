from pyspark.sql import functions as F

from rnadam_spark.functions.hashing import poly_hash_col, poly_hash_sql
from rnadam_spark.functions.shingles import char_shingles, token_ngrams, tokens


def test_char_shingles_matches_scala_sliding(spark):
    # reference: sequence.sliding(k) (Index.scala:87-89); oracle semantics
    # from QuantifySuite.scala:33-36 (substring over [start, end))
    df = spark.createDataFrame([("CAATCCTTCG",), ("ACG",), ("AC",), ("",)], ["s"])
    rows = df.select(char_shingles("s", 3).alias("k")).collect()
    assert rows[0].k == ["CAA", "AAT", "ATC", "TCC", "CCT", "CTT", "TTC", "TCG"]
    assert rows[1].k == ["ACG"]
    assert rows[2].k == []
    assert rows[3].k == []


def test_tokens_and_ngrams(spark):
    df = spark.createDataFrame([("the quick  brown fox",), ("one",), ("",)], ["s"])
    rows = df.select(tokens("s").alias("t"), token_ngrams("s", 2).alias("g")).collect()
    assert rows[0].t == ["the", "quick", "brown", "fox"]
    assert rows[0].g == ["the quick", "quick brown", "brown fox"]
    assert rows[1].t == ["one"] and rows[1].g == []
    assert rows[2].t == [] and rows[2].g == []


def test_poly_hash_col_matches_sql_and_duckdb(spark):
    import duckdb

    words = [("spark",), ("quick",), ("abcde",)]
    df = spark.createDataFrame(words, ["w"])
    got_col = [r.h for r in df.select(poly_hash_col("w", 5).alias("h")).collect()]
    got_sql = [r.h for r in df.selectExpr(f"{poly_hash_sql('w', 5)} AS h").collect()]
    duck = [
        duckdb.sql(f"SELECT {poly_hash_sql(repr(w), 5)} AS h").fetchone()[0] for (w,) in words
    ]
    py = []
    for (w,) in words:
        acc = ord(w[0])
        for ch in w[1:5]:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        py.append(acc)
    assert got_col == got_sql == duck == py
