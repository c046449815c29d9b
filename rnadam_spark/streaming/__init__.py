from rnadam_spark.streaming import events  # noqa: F401
