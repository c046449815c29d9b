"""Empty-input smoke: every major operator must return an EMPTY result
(or a clear ValueError for trainers with nothing to train on) on an
empty corpus — not a deep AnalysisException. Real pipelines hit empty
inputs constantly (a filter chain that drops everything, a shard with
no survivors), and the failure then must be legible."""

from pyspark.sql import functions as F  # noqa: F401

from rnadam_spark.operators import (
    dedup,
    diffing,
    funnel,
    mixing,
    repetition,
    search,
    splits,
    text,
    web,
)
from rnadam_spark.operators.clustering import connected_components
from rnadam_spark.operators.sampling import cap_per_group


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )


def test_empty_corpus_smoke(spark):
    empty = _empty_docs(spark)
    no_pairs = spark.createDataFrame([], "doc_a BIGINT, doc_b BIGINT")
    assert text.c4_clean(empty).count() == 0
    assert text.nfkc_normalize(empty).count() == 0
    assert text.chunk_documents(empty).count() == 0
    assert dedup.lsh_candidate_pairs(empty, max_bucket=10).count() == 0
    assert dedup.verify_pairs(no_pairs, empty).count() == 0
    assert dedup.paragraph_near_dups(empty).count() == 0
    rep = dedup.candidate_recall(empty, sample_fraction=1.0)
    assert rep["n_true"] == 0 and rep["recall"] is None
    assert connected_components(no_pairs).count() == 0
    assert repetition.dedup_lines(empty).count() == 0
    assert search.bm25_topk(empty, "the query", k=5).count() == 0
    assert cap_per_group(empty, "source", 3, "doc_id").count() == 0
    bl = empty.sparkSession.createDataFrame([("x.com",)], "domain STRING")
    assert web.filter_blocklisted_domains(empty, bl, suffix=True).count() == 0
    assert splits.assign_split(empty, "doc_id", {"train": 0.9, "val": 0.1}).count() == 0
    assert mixing.mixture_sample(empty, {"web": 1.0}, 1000).count() == 0
    assert diffing.corpus_diff(empty, empty).count() == 0
    # the funnel keeps its stable shape (input + every stage) on nothing
    stages = funnel.curation_funnel(empty).collect()
    assert len(stages) == 9 and all(r.n_dropped == 0 for r in stages)
