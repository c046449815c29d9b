from rnadam_spark.operators import bpe, clustering, dedup, diffing, funnel, graph, lm, multimodal, repetition, sampling, search, similarity, spans, text, unigram, web  # noqa: F401
