from rnadam_spark.operators import dedup, funnel, search, similarity, text, unigram  # noqa: F401
