"""Query modules — importing this package registers every query."""

from rnadam_spark.queries import (  # noqa: F401
    genomics_q,
    ingest_q,
    pipeline_q,
    relational,
    web_q,
    windows_q,
)
