from pyspark.sql import types as T

from rnadam_spark.operators import similarity

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to query
        (2, [0.9, 0.1, 0.0, 0.0]),   # close
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_brute_force_topk_ordering(spark):
    got = similarity.brute_force_topk(_emb(spark), 0, 4).collect()
    assert [r.vec_id for r in got] == [1, 2, 3, 4]
    assert got[0].cos == 1.0
    assert abs(got[1].cos - 0.993884) < 1e-6
    assert got[2].cos == 0.0 and got[3].cos == -1.0


def test_lsh_buckets_deterministic_and_grouping(spark):
    df = _emb(spark)
    b1 = {r.vec_id: r.bucket for r in similarity.lsh_buckets(df, dim=4).collect()}
    b2 = {r.vec_id: r.bucket for r in similarity.lsh_buckets(df.repartition(3), dim=4).collect()}
    assert b1 == b2  # layout-independent
    assert b1[0] == b1[1]  # identical vectors share a bucket


def test_bucket_near_pairs_contains_identical_pair(spark):
    pairs = {
        (r.vec_a, r.vec_b): r.cos
        for r in similarity.bucket_near_pairs(_emb(spark), min_cos=-1.0, dim=4).collect()
    }
    assert pairs[(0, 1)] == 1.0
