"""Query modules — importing this package registers every query."""

from rnadam_spark.queries import genomics_q  # noqa: F401
