from rnadam_spark.operators import dedup, funnel, similarity, text  # noqa: F401
