from rnadam_spark.algorithms import index, quantify, tare  # noqa: F401
