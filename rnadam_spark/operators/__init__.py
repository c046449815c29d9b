# Light (pure-pyspark) operator modules import eagerly; multimodal and
# unigram import pandas at module top for their Arrow-batched kernels,
# so they stay lazy — `from rnadam_spark.operators import multimodal`
# still works, but a CLI command that never touches them does not pay
# (or require) the pandas import.
from rnadam_spark.operators import (  # noqa: F401
    bpe,
    clustering,
    dedup,
    diffing,
    dsir,
    funnel,
    graph,
    html,
    lm,
    repetition,
    sampling,
    search,
    sketches,
    similarity,
    spans,
    splits,
    text,
    web,
)
