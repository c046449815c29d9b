"""Query modules — importing this package registers every query."""

from rnadam_spark.queries import genomics_q, pipeline_q, relational, windows_q  # noqa: F401
