from rnadam_spark.operators import dedup, funnel, search, similarity, text  # noqa: F401
