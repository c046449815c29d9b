from rnadam_spark.operators import dedup, funnel, graph, search, similarity, text, unigram  # noqa: F401
