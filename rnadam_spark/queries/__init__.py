"""Query modules — importing this package registers every query."""

from rnadam_spark.queries import genomics_q, pipeline_q, relational, web_q, windows_q  # noqa: F401
