"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "stages": {"index": {...}, "quantify": {...}},
"sf": ...}.

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect). A warmup action amortizes JVM/codegen startup out
of the measurements. The ``stages`` blocks time the index build and the
EM flagship stage-by-stage under the reference's Timers.scala names
(BASELINE.md: per-stage timings so regressions are attributable).

Since round 6 every headline and A/B timing is the MINIMUM of
``$SPARK_GRAFT_BENCH_REPEATS`` (default 3) cache-cleared runs: the
shared host shows multi-second noise spikes (the same query measured
0.7s and 12.4s minutes apart), and min-of-k is the standard estimator
for the steady-state cost of identical repeated work — each repeat
starts from a cleared cache store, so it measures the same cold-cache
plan the single-shot protocol did. The JSON records ``repeats``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rnadam_spark.registry import QUERIES, load_all
from rnadam_spark.session import get_spark


def _bench_queries() -> dict:
    """Registered queries plus benchmark-only shapes that were retired
    from the 50-entry correctness gate but stay timed here (their
    semantics remain pinned: fraction_of_group via em_two_steps' alpha1
    CTE, simhash_16 inside simhash_hamming_pairs' oracle)."""
    from rnadam_spark.queries.pipeline_q import (
        embedding_topk,
        lsh_candidate_pairs,
        minhash_signatures,
        quality_scores,
        simhash_16,
    )
    from rnadam_spark.queries.genomics_q import equivalence_classes
    from rnadam_spark.queries.windows_q import fraction_of_group, hourly_event_rollup

    return {
        **QUERIES,
        "fraction_of_group": fraction_of_group,
        "simhash_16": simhash_16,
        # deregistered round 6 (gopher_quality rotation) but pinned in
        # the headline set for round-over-round comparability
        "quality_scores": quality_scores,
        # deregistered round 7 (lm_perplexity rotation); headline keeps
        # timing the signature projection round-over-round
        "minhash_signatures": minhash_signatures,
        # deregistered round 10 (pack_sequences/vocabulary_shift
        # rotation); headline keeps timing the tumbling-window kernel
        "hourly_event_rollup": hourly_event_rollup,
        # deregistered round 11 (ann_recall/excise_paragraphs rotation);
        # headline keeps timing the brute-force ANN baseline
        "embedding_topk": embedding_topk,
        # re-registered in the r13 optimization round (the mid-build
        # rotation was undone: optimization rounds keep the declared
        # set a superset of the prior round's); the explicit entries
        # are now redundant with **QUERIES but kept for clarity
        "lsh_candidate_pairs": lsh_candidate_pairs,
        "equivalence_classes": equivalence_classes,
    }

# Headline set: the reference's hot path (k-mer count → classes), the
# EM building blocks, representative relational shapes, and the
# training-data pipeline operators.
HEADLINE = [
    "kmer_count",
    "equivalence_classes",
    "class_counts_normalized",
    "pricing_summary",
    "top_revenue_orders",
    "local_supplier_volume",
    "fraction_of_group",
    "sessionize_events",
    "asof_purchase_view",
    "hourly_event_rollup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_16",
    "embedding_topk",
    "embedding_bucket_pairs",
    "quality_scores",
    # the iterative reference workloads (VERDICT r1 #8): EM flagship +
    # the distributed OLS length calibration
    "em_quantify",
    "length_bias_calibration",
]


def _stage_blocks(spark, sf_dir: str) -> dict[str, dict[str, float]]:
    """Per-stage timings for the index build and the EM flagship over
    the documents tables (each document doubles as genome contig +
    transcript, as in the em_quantify query)."""
    from pyspark.sql import functions as F

    from rnadam_spark.algorithms.index import build_index
    from rnadam_spark.algorithms.quantify import quantify
    from rnadam_spark.instrument import StageTimers, force
    from rnadam_spark.sources.tables import load_table

    k = 5
    docs = load_table(spark, sf_dir, "documents", widen=True).filter(F.col("n_chars") >= k)
    genome = docs.select(
        F.col("doc_id").cast("string").alias("contig"), F.col("text").alias("sequence")
    )
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("t_id"),
        F.lit("g").alias("gene_id"),
        F.lit(True).alias("strand"),
        F.array(
            F.struct(
                F.concat(F.col("doc_id").cast("string"), F.lit("e")).alias("exon_id"),
                F.col("doc_id").cast("string").alias("contig"),
                F.lit(0).cast("long").alias("start"),
                (F.col("n_chars") + 1).cast("long").alias("end"),
            )
        ).alias("exons"),
    )
    reads = docs.select(F.col("doc_id").alias("read_id"), F.col("text").alias("sequence"))

    idx_timers = StageTimers()
    kmer_to_class, class_kmers, class_transcripts = build_index(
        transcripts, genome, k, timers=idx_timers
    )
    force(kmer_to_class)

    q_timers = StageTimers()
    # kmer calibration stays off: the document alphabet has no valid
    # ACGT dinucleotide contexts (featurize would raise, by contract)
    result = quantify(
        reads,
        kmer_to_class,
        class_transcripts,
        transcripts,
        k=k,
        max_iterations=5,
        calibrate_kmer_bias=False,
        calibrate_length_bias=True,
        timers=q_timers,
    )
    force(result.select("t_id", "abundance"))
    return {"index": idx_timers.as_dict(), "quantify": q_timers.as_dict()}


def _ab_blocks(spark, sf_dir: str) -> dict[str, dict[str, float]]:
    """Per-round A/B timings of plan-strategy alternatives (VERDICT r2
    #7/#8): each variant forced through the noop sink after a cache
    clear, so the numbers are comparable run-to-run and the measured
    winner — not a stale commit-message claim — justifies the default.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rnadam_spark.functions.rounding import hround
    from rnadam_spark.lineage import truncate_lineage
    from rnadam_spark.operators import dedup, repetition, similarity, text
    from rnadam_spark.operators import multimodal as mmod_ab
    from rnadam_spark.operators import search as search_ab
    from rnadam_spark.operators import spans as spans_ab
    from rnadam_spark.queries.genomics_q import em_quantify
    from rnadam_spark.queries.genomics_q import kmer_count as kmer_count_q
    from rnadam_spark.queries.pipeline_q import _BENCH_MOD, DECONTAM_N, LSH_MAX_BUCKET
    from rnadam_spark.queries.relational import pricing_summary
    from rnadam_spark.sources.tables import load_table

    def timed(make_df) -> float:
        return _min_of_repeats(
            spark, lambda: make_df().write.format("noop").mode("overwrite").save()
        )

    import shutil
    import tempfile

    from rnadam_spark.sources import sink as sink_mod

    docs = load_table(spark, sf_dir, "documents", widen=True)

    # clustered-sink A/B: z-order write (sketch pass + range exchange on
    # the Morton code) vs the lexicographic strawman (range exchange on
    # the leading column only) — the delta is what multi-column data
    # skipping costs at WRITE time; the read-side benefit is pinned by
    # tests/test_sink.py's footer-stats skip counts
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    _tmp = tempfile.mkdtemp(prefix="bench_zorder_")
    try:
        zorder_write = _min_of_repeats(
            spark,
            lambda: sink_mod.write_clustered(
                li, _tmp + "/z", ["l_orderkey", "l_partkey"], bits=6
            ),
        )
        linear_write = _min_of_repeats(
            spark,
            lambda: (
                li.repartitionByRange("l_orderkey")
                .sortWithinPartitions("l_orderkey")
                .write.mode("overwrite")
                .parquet(_tmp + "/linear")
            ),
        )
    finally:
        shutil.rmtree(_tmp, ignore_errors=True)

    # ADC table-delivery A/B: codes materialized once so both variants
    # time the SCORING pass, not the shared encode
    emb = load_table(spark, sf_dir, "embeddings")
    pq_books = similarity.train_pq(emb, m=8, nbits=4, max_iterations=3)
    pq_codes = truncate_lineage(similarity.pq_encode(emb, pq_books))
    pq_query = [v for sub in range(len(pq_books)) for v in pq_books[sub][0]]

    def dedup_lines_window(d):
        # the row_number() twin of repetition.dedup_lines — identical
        # outputs, but the per-line window funnels each hot boilerplate
        # line through ONE task (the docstring's scale argument; this
        # A/B keeps the claim measurement-backed at sf0.1)
        exploded = d.select(
            F.col("doc_id"),
            F.posexplode(
                F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
            ).alias("line_no", "line"),
        )
        participating = F.length(F.trim(F.col("line"))) >= 8
        w = Window.partitionBy("line").orderBy("doc_id", "line_no")
        flagged = exploded.withColumn(
            "keep", ~participating | (F.row_number().over(w) == 1)
        )
        kept = F.array_sort(
            F.collect_list(
                F.when(F.col("keep"), F.struct(F.col("line_no").alias("p"), F.col("line").alias("l")))
            )
        )
        return flagged.groupBy("doc_id").agg(
            F.array_join(F.transform(kept, lambda x: x["l"]), "\n").alias("text"),
            F.sum(F.col("keep").cast("bigint")).alias("n_lines_kept"),
            F.sum((~F.col("keep")).cast("bigint")).alias("n_lines_dropped"),
        )

    def pricing_double_drift():
        # the pre-round-9 double-sum twin of pricing_summary: ~4x
        # faster, but its 4dp-rounded sums drift with summation order
        # past ~6M rows (SURVEY sf1 block) — the A/B prices what the
        # order-independent decimal accumulation costs at sf0.1
        li = load_table(spark, sf_dir, "lineitem")
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                hround(F.sum("l_quantity"), 4).alias("sum_qty"),
                hround(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                hround(F.sum(disc), 4).alias("sum_disc_price"),
                hround(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
                hround(F.avg("l_quantity"), 4).alias("avg_qty"),
                hround(F.avg("l_extendedprice"), 4).alias("avg_price"),
                hround(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    return {
        "clustered_write": {
            "zorder": zorder_write,
            "linear_sort": linear_write,
        },
        # round-9/10: scale-exact money sums vs the double twin — the
        # measured price of value-exactness at any data volume. Round 10
        # replaced the per-row DECIMAL(38,10) casts with quantized-long
        # hi/lo sums recombined per GROUP in decimal (functions/
        # rounding.py) — same exactness, ~2x cheaper (1.83s -> 1.04s).
        "pricing_summary_money_sum": {
            "split_long_exact": timed(lambda: pricing_summary(spark, sf_dir)),
            "double_drift": timed(pricing_double_drift),
        },
        # VERDICT r6 #5: plan-literal ADC vs broadcast-join ADC over the
        # same persisted codes (m=8, nbits=4 → 128 table entries;
        # auto-switch flips to join above PQ_LITERAL_MAX)
        "pq_topk_on_codes": {
            "literal_table": timed(
                lambda: similarity.pq_topk_on_codes(pq_codes, pq_query, pq_books)
            ),
            "broadcast_join_table": timed(
                lambda: similarity.pq_topk_on_codes(
                    pq_codes, pq_query, pq_books, strategy="join"
                )
            ),
        },
        # VERDICT r6 #8: the dedup_lines aggregate-then-join form vs its
        # window twin
        "dedup_lines": {
            "aggregate_join": timed(lambda: repetition.dedup_lines(docs)),
            "window_rownum": timed(lambda: dedup_lines_window(docs)),
        },
        # VERDICT r10 #6: the engine's heaviest interpreted-HOF kernel
        # vs its Arrow-batched pandas twin (value-equal, pinned by
        # tests). Measured r11: pandas wins 5.3x at sf10 (18.5s vs
        # 3.5s) — interpreted per-row HOF evaluation costs more than
        # the Arrow transfer + Counter work — so the REGISTERED row
        # defaults to the pandas form; this A/B keeps the trade
        # re-measured every round.
        "repetition_stats": {
            "interpreted_hof": timed(lambda: repetition.repetition_stats(docs)),
            "pandas_arrow": timed(
                lambda: repetition.repetition_stats_pandas(docs)
            ),
        },
        # same trade for the Gopher page rules (pandas won 2.2x at sf10
        # in r11; registered default follows the measurement)
        "gopher_quality": {
            "staged_hof": timed(lambda: text.gopher_quality(docs)),
            "pandas_arrow": timed(lambda: text.gopher_quality_pandas(docs)),
        },
        # grouped = the r13 second-session default: signature-dedup
        # before banding (4.8x at sf10), group-grain cap + pair dedup,
        # no doc-level distinct. sf10 5.99 vs inrow 9.44s; sf0.1 a
        # 0.5s loss — crossover published here every round
        "lsh_candidate_pairs": {
            "grouped_capped": timed(
                lambda: dedup.lsh_candidate_pairs(docs, max_bucket=LSH_MAX_BUCKET)
            ),
            "inrow_capped": timed(
                lambda: dedup.lsh_candidate_pairs(
                    docs, max_bucket=LSH_MAX_BUCKET, strategy="inrow"
                )
            ),
            "selfjoin_capped": timed(
                lambda: dedup.lsh_candidate_pairs(
                    docs, max_bucket=LSH_MAX_BUCKET, strategy="selfjoin"
                )
            ),
            # r14 (VERDICT r13 #1/#5): the crossover decade for the
            # grouped default, in the driver's artifact (sf10 evidence
            # lives in sf10_scaling.strategy_ab)
            **_strategy_sf1_ab(
                spark,
                {
                    "grouped_capped_sf1": lambda d1: dedup.lsh_candidate_pairs(
                        d1, max_bucket=LSH_MAX_BUCKET
                    ),
                    "inrow_capped_sf1": lambda d1: dedup.lsh_candidate_pairs(
                        d1, max_bucket=LSH_MAX_BUCKET, strategy="inrow"
                    ),
                },
            ),
        },
        # r13 second session: the registered paragraph_near_dups chain
        # with candidates/verify/CC at the DISTINCT-TEXT grain vs the
        # unit grain (38.9M -> 15.7M verify pairs at sf10, 239 -> 86s;
        # sf0.1 pays ~3s of extra stages — the crossover published
        # here; losers set-equal, test_paragraph_near_dups_contracted_
        # matches)
        "paragraph_near_dups": {
            "contracted_text_grain": timed(
                lambda: dedup.paragraph_near_dups(
                    docs,
                    threshold=0.8,
                    max_bucket=LSH_MAX_BUCKET,
                    min_chars=40,
                    split_pattern=" table ",
                    unit_key="encoded",
                )
            ),
            "unit_grain": timed(
                lambda: dedup.paragraph_near_dups(
                    docs,
                    threshold=0.8,
                    max_bucket=LSH_MAX_BUCKET,
                    min_chars=40,
                    split_pattern=" table ",
                    unit_key="encoded",
                    contracted=False,
                )
            ),
        },
        # r13 second session: the registered dedup_clusters' star
        # rounds over the CONTRACTED signature-group graph (groups are
        # cliques; 10.6x fewer edges at sf10, 52-66s -> ~13s) vs the
        # doc-level pairs+CC composition — (node, component) sets
        # identical (test_lsh_components_match_pairs_cc)
        "dedup_clusters": {
            "contracted_cc": timed(
                lambda: dedup.lsh_near_dup_components(
                    docs, max_bucket=LSH_MAX_BUCKET
                )
            ),
            "doc_level_cc": timed(
                lambda: dedup.lsh_near_dup_components(
                    docs, max_bucket=LSH_MAX_BUCKET, contracted=False
                )
            ),
        },
        # r13 twin: the numpy minhash kernel (per-doc grain straight
        # out of the scan, zero shuffle) vs the explode+partial-agg JVM
        # form — integer-exact, pinned value-equal by
        # tests/test_dedup.py; the default follows the measurement
        # (0.35 vs 0.81s at sf0.1, 4.9 vs 12.1s at sf10 in the r13
        # adoption runs)
        "minhash": {
            "pandas_numpy": timed(lambda: dedup.minhash_signatures(docs)),
            "jvm_explode_agg": timed(
                lambda: dedup.minhash_signatures(docs, kernel="jvm")
            ),
        },
        # r13 twin, same discipline: numpy simhash (distinct-token
        # matrix + np.add.reduceat bit sums) vs the explode + 16-sum
        # JVM aggregate — integer-exact, parity incl. tokenization
        # corners pinned by tests/test_dedup.py
        "simhash": {
            "pandas_numpy": timed(lambda: dedup.simhash16(docs)),
            "jvm_explode_agg": timed(lambda: dedup.simhash16(docs, kernel="jvm")),
        },
        # r13 twin: the equivalence-class grain via the Arrow/Counter
        # kernel vs the in-row run-length JVM form (md5 ids pinned
        # value-equal by tests/test_index.py; 5.0 vs 19.6s at sf10 in
        # the adoption runs)
        "classes": {
            "pandas_counter": timed(lambda: _classes_q(spark, sf_dir, "pandas")),
            "jvm_runlength": timed(lambda: _classes_q(spark, sf_dir, "jvm")),
        },
        # r13 twin: the registered kmer_count row on the Counter-partial
        # kernel (em_global_counts' form) vs the codegen explode+hashagg
        # — sf0.1 is a coin flip, sf10 is 2.3 vs 7.1s; the default
        # follows the sf10 measurement (contamination's crossover shape)
        "kmer_count": {
            "pandas_counter": timed(lambda: kmer_count_q(spark, sf_dir, kernel="pandas")),
            "jvm_explode_agg": timed(lambda: kmer_count_q(spark, sf_dir, kernel="jvm")),
            # r14 (VERDICT r13 #5): the decade where the Counter default
            # wins, published next to the sf0.1 row it loses
            **(
                {
                    "pandas_counter_sf1": _timed_once(
                        lambda: kmer_count_q(spark, _sf1_dir(), kernel="pandas")
                    ),
                    "jvm_explode_agg_sf1": _timed_once(
                        lambda: kmer_count_q(spark, _sf1_dir(), kernel="jvm")
                    ),
                }
                if _sf1_dir() is not None
                else {}
            ),
        },
        # r13 twin: the registered bm25 row on the numpy scoring
        # kernel (exact float sequence; 8.7 vs 2.1s at sf10, tie at
        # sf0.1) vs the per-term interpreted filter() HOF form
        "bm25_topk": {
            "pandas_counter": timed(
                lambda: search_ab.bm25_topk(docs, "the data system and network", k=10)
            ),
            "jvm_filter_hof": timed(
                lambda: search_ab.bm25_topk(
                    docs, "the data system and network", k=10, kernel="jvm"
                )
            ),
            # r14 (VERDICT r13 #5): crossover decade
            **_strategy_sf1_ab(
                spark,
                {
                    "pandas_counter_sf1": lambda d1: search_ab.bm25_topk(
                        d1, "the data system and network", k=10
                    ),
                    "jvm_filter_hof_sf1": lambda d1: search_ab.bm25_topk(
                        d1, "the data system and network", k=10, kernel="jvm"
                    ),
                },
            ),
        },
        # r13 twin: duplicated-span detection with the vectorized
        # spec-XXH64 window builder vs the interpreted
        # array_join(slice) + xxhash64 expression — row-identical
        # windows (bit-exact XXH64 parity pinned by tests/test_spans.py;
        # 22.2 vs 7.8s at sf10 in the adoption runs)
        "duplicated_spans": {
            "pandas_xxh64": timed(
                lambda: spans_ab.duplicated_spans(docs, min_tokens=13)
            ),
            "jvm_expr": timed(
                lambda: spans_ab.duplicated_spans(docs, min_tokens=13, kernel="jvm")
            ),
            # r14 (VERDICT r13 #5): crossover decade
            **_strategy_sf1_ab(
                spark,
                {
                    "pandas_xxh64_sf1": lambda d1: spans_ab.duplicated_spans(
                        d1, min_tokens=13
                    ),
                    "jvm_expr_sf1": lambda d1: spans_ab.duplicated_spans(
                        d1, min_tokens=13, kernel="jvm"
                    ),
                },
            ),
        },
        # r13 twins: the multimodal fingerprint passes on the batched
        # fake-path kernels (bit-identical, parity pinned by
        # tests/test_multimodal.py) and the in-row pair expansion vs
        # the banded self-join (same pair set; the text corpus's fake
        # hashes band into ~900M candidates at sf10, where inrow's
        # n(n-1)/2 tail-slice generation beat the n^2 self-join
        # 10.9 vs 17.9s end-to-end in the adoption runs)
        "dhash": {
            "batch_kernel": timed(
                lambda: mmod_ab.dhash_assets(mmod_ab.assets_from_documents(docs))
            ),
            "scalar_kernel": timed(
                lambda: mmod_ab.dhash_assets(
                    mmod_ab.assets_from_documents(docs), kernel="scalar"
                )
            ),
            # grouped = the r13 second-session default (identical
            # hashes collapse 86x at sf10, bit_count per distinct hash
            # pair): sf10 3.59 vs inrow 14.13s, sf0.1 a ~0.9s loss —
            # the crossover published here every round
            "pairs_grouped": timed(
                lambda: mmod_ab.dhash_hamming_pairs(
                    mmod_ab.dhash_assets(mmod_ab.assets_from_documents(docs))
                )
            ),
            "pairs_inrow": timed(
                lambda: mmod_ab.dhash_hamming_pairs(
                    mmod_ab.dhash_assets(mmod_ab.assets_from_documents(docs)),
                    strategy="inrow",
                )
            ),
            "pairs_selfjoin": timed(
                lambda: mmod_ab.dhash_hamming_pairs(
                    mmod_ab.dhash_assets(mmod_ab.assets_from_documents(docs)),
                    strategy="selfjoin",
                )
            ),
        },
        "audio_fp": {
            "batch_kernel": timed(
                lambda: mmod_ab.audio_fingerprint(mmod_ab.assets_from_documents(docs))
            ),
            "scalar_kernel": timed(
                lambda: mmod_ab.audio_fingerprint(
                    mmod_ab.assets_from_documents(docs), kernel="scalar"
                )
            ),
        },
        # r13 twins: the embedding-family per-row projections on the
        # exact-order numpy kernels vs the interpreted literal-HOF
        # forms — integer outputs bit-identical (parity pinned by
        # tests/test_similarity.py); sf10 adoption runs measured
        # pq_encode 38.2 → 2.4s (16x, the encode-once pass PQ exists
        # to amortize) and ivf_cells 5.0 → 1.3s
        "pq_encode": {
            "pandas_numpy": timed(lambda: similarity.pq_encode(emb, pq_books)),
            "jvm_literal_hof": timed(
                lambda: similarity.pq_encode(emb, pq_books, kernel="jvm")
            ),
        },
        "ivf_cells": {
            "pandas_numpy": timed(lambda: similarity.ivf_cells(emb)),
            "jvm_literal_hof": timed(
                lambda: similarity.ivf_cells(emb, kernel="jvm")
            ),
        },
        # r13 twin (second session): the sign-random-projection
        # bucketing on the exact-order numpy kernel vs the folded-
        # literal HOF form — same §12 shape (16 planes × 64 dims =
        # 1024 interpreted lambda evals/row on the JVM side); buckets
        # bit-identical (tests/test_similarity.py::
        # test_lsh_buckets_scaled_kernels_equal)
        "lsh_buckets_scaled": {
            "pandas_numpy": timed(lambda: similarity.lsh_buckets_scaled(emb)),
            "jvm_literal_hof": timed(
                lambda: similarity.lsh_buckets_scaled(emb, kernel="jvm")
            ),
        },
        # r13 twin: quality_scores on the curation parity kit vs the
        # staged-HOF form (0.37 vs 0.62s at sf0.1, 3.6 vs 4.8s at sf10
        # in the adoption runs; parity by tests/test_text_curation.py).
        # Measured over the UNWIDENED table — the shape every quality
        # call site actually reads (pipeline_q loads documents without
        # widen here): over a WIDENED handle the comparison inverts
        # (jvm 0.29 vs pandas 0.43 at sf0.1 — the 32-way exchange that
        # parallelizes the interpreted HOFs costs the pandas form more
        # than its single Arrow boundary saves), so A/B-ing the widened
        # frame would publish a crossover no caller ever sees.
        "quality_scores": {
            "pandas_arrow": timed(
                lambda: text.quality_scores(load_table(spark, sf_dir, "documents"))
            ),
            "jvm_staged_hof": timed(
                lambda: text.quality_scores(
                    load_table(spark, sf_dir, "documents"), kernel="jvm"
                )
            ),
        },
        "em_quantify": {
            "window": timed(lambda: em_quantify(spark, sf_dir)),
            "skew_safe": timed(lambda: em_quantify(spark, sf_dir, skew_safe=True)),
        },
        # r13 twin: the loop-static PageRank edge cache (materialized
        # once, key-partitioned by a data-derived count) vs the lazy
        # form that re-executes the edge subtree every iteration. The
        # REGISTERED row defaults to lazy by measurement (over its
        # cheap projected edges the node-sized ranks broadcast, so the
        # edge side never shuffles and the cache only saves re-scans:
        # sf10 lazy 4.03-4.36s vs cache 4.17-5.65s); ranks identical
        # (tests/test_graph.py), re-measured here every round
        "pagerank": {
            "edge_cache": timed(lambda: _pagerank_q(spark, sf_dir, True)),
            "lazy_edges": timed(lambda: _pagerank_q(spark, sf_dir, False)),
            # r14 (VERDICT r13 #7): the documented opt-in case measured
            # on the shape it was built for — edges EXTRACTED FROM
            # DOCUMENT TEXT (web.domain_edges: a regex URL scan of the
            # corpus per edge read), where (iterations − 1) saved
            # corpus passes are the cache's theory of victory
            "text_edges_cache": timed(
                lambda: _pagerank_text_edges(spark, sf_dir, True)
            ),
            "text_edges_lazy": timed(
                lambda: _pagerank_text_edges(spark, sf_dir, False)
            ),
        },
        # decontamination join strategy: broadcast the benchmark grams
        # (default — eval suites are tiny next to the corpus) vs the
        # sort-merge plan a corpus-vs-corpus overlap would need
        "contamination_scores": {
            "broadcast_bench": timed(
                lambda: text.contamination_scores(
                    docs, docs.filter(F.col("doc_id") % _BENCH_MOD == 0), n=DECONTAM_N
                )
            ),
            "sortmerge_bench": timed(
                lambda: text.contamination_scores(
                    docs,
                    docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
                    n=DECONTAM_N,
                    broadcast_benchmark=False,
                )
            ),
            # the r11 twin series' biggest win: 21.8x at sf10 (4.8s vs
            # 105s) — the registered row defaults to the pandas form
            "pandas_arrow": timed(
                lambda: text.contamination_scores_pandas(
                    docs, docs.filter(F.col("doc_id") % _BENCH_MOD == 0), n=DECONTAM_N
                )
            ),
            # break-even decade (r11 VERDICT "what's wrong" #1: the
            # pandas default LOSES at sf0.1 — 1.03 vs 0.69s — and wins
            # 21.8x at sf10, so the crossover must be a published
            # number, not an interpolation): the same two forms timed
            # one decade up when the deterministic sf1 corpus exists
            **_contamination_sf1_ab(spark, text, F, _BENCH_MOD, DECONTAM_N),
        },
        # r12 twin series: LM scorers and the vocabulary kernel — each
        # registered default follows the sf10 measurement, these rows
        # re-check the trade at sf0.1 every round
        **_lm_vocab_ab(spark, timed, docs),
        # r12 fused-pandas DSIR (Counter histograms + fused scorer) vs
        # the explode+join form — default follows sf10 (11.4 vs 17.7s)
        "dsir_weights": _dsir_ab(spark, timed, docs),
        # r12 fused curation scores vs the two-projection form whose
        # pushed-down filters evaluate each kernel TWICE (36.5 vs ~13s
        # at sf10) — the composite's default follows the fused form
        "curated": _curated_ab(spark, timed, sf_dir),
        # r12 fused-pandas EM state build vs the r11 kernel+join form —
        # the flagship's default follows the sf10/sf100 measurement
        # (5.9 vs 20.7s / 53.8 vs 329.9s); this row re-checks at sf0.1
        "em_state": {
            "fused_pandas": _timed_em_state(spark, docs, True),
            "hof_join": _timed_em_state(spark, docs, False),
        },
        # r13: the loop residual — checkpoint cadence over a pre-built
        # state (every-1 default; see _em_loop_ab for the adoption bar)
        "em_loop": _em_loop_ab(spark, docs),
    }


def _classes_q(spark, sf_dir: str, kernel: str):
    from rnadam_spark.queries.genomics_q import _classes

    return _classes(spark, sf_dir, kernel=kernel)


def _pagerank_q(spark, sf_dir: str, cache_edges: bool):
    from rnadam_spark.queries.web_q import pagerank

    return pagerank(spark, sf_dir, cache_edges=cache_edges)


def _pagerank_text_edges(spark, sf_dir: str, cache_edges: bool):
    """PageRank over edges extracted from document TEXT (regex URL
    scan per edge read) — the expensive-edge-subtree shape the
    ``cache_edges`` opt-in was built for (r14, VERDICT r13 #7).
    Synthetic URLs are injected into the text the same way the
    blocklist gate row does, so the corpus has a real link graph."""
    from pyspark.sql import functions as F

    from rnadam_spark.operators import graph, web
    from rnadam_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", widen=True)
    linked = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" see http://a.src"),
            (F.col("doc_id") % 11).cast("string"),
            F.lit(".org/x and http://mirror"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".io/y"),
        ).alias("text"),
    )
    edges = web.domain_edges(linked)
    return graph.pagerank(edges, iterations=5, cache_edges=cache_edges)


def _curated_ab(spark, timed, sf_dir: str) -> dict[str, float]:
    """A/B the curated_documents composite: fused Arrow scores vs the
    two-JVM-projection form (whose filters push into the scans and
    re-evaluate both kernels)."""
    from pyspark.sql import functions as F

    from rnadam_spark.operators import dedup, text
    from rnadam_spark.queries.pipeline_q import curated_documents
    from rnadam_spark.sources.tables import load_table

    def two_projection():
        docs = load_table(spark, sf_dir, "documents")
        q = text.quality_scores(docs).select("doc_id", "quality")
        lng = text.lang_scores(docs).select("doc_id", "predicted_lang")
        canon = dedup.exact_dup_groups(docs).select(
            F.col("canonical_id").alias("doc_id"), "n_dups"
        )
        return (
            q.join(lng, "doc_id")
            .join(canon, "doc_id")
            .filter((F.col("quality") >= 0.9) & (F.col("predicted_lang") == "en"))
            .select("doc_id", "quality", "predicted_lang", "n_dups")
        )

    return {
        "fused_pandas": timed(lambda: curated_documents(spark, sf_dir)),
        "two_projection_jvm": timed(two_projection),
    }


def _dsir_ab(spark, timed, docs) -> dict[str, float]:
    """A/B the full dsir gate-row pipeline (two histograms + scorer)
    in both forms."""
    from pyspark.sql import functions as F  # noqa: F401

    from rnadam_spark.operators import dsir, sampling
    from rnadam_spark.queries.pipeline_q import DSIR_BUCKETS, _DSIR_SEED, _DSIR_TARGET_FRAC

    def run(pandas_form: bool):
        target = sampling.hash_sample(docs, "doc_id", _DSIR_TARGET_FRAC, seed=_DSIR_SEED)
        bcount = dsir.bucket_counts_pandas if pandas_form else dsir.bucket_counts
        score = dsir.dsir_log_weights_pandas if pandas_form else dsir.dsir_log_weights
        return score(docs, bcount(target, DSIR_BUCKETS), bcount(docs, DSIR_BUCKETS), DSIR_BUCKETS)

    def run_self():
        # r13 default: one corpus pass histograms raw+target together
        return dsir.dsir_log_weights_self_pandas(
            docs,
            sampling.sample_predicate(
                F.col("doc_id"), _DSIR_TARGET_FRAC, seed=_DSIR_SEED
            ),
            DSIR_BUCKETS,
        )

    out = {
        "one_pass_self": timed(run_self),
        "fused_pandas": timed(lambda: run(True)),
        "explode_join": timed(lambda: run(False)),
    }
    # r13 (VERDICT r12 #6): the dsir default follows the sf10/sf100
    # wins while sf0.1 is a coin-flip — publish the crossover decade
    # like contamination's, single timed run per form at sf1
    docs1 = _sf1_corpus(spark)
    if docs1 is not None:
        import time as _time

        def run1(pandas_form: bool):
            target = sampling.hash_sample(
                docs1, "doc_id", _DSIR_TARGET_FRAC, seed=_DSIR_SEED
            )
            bcount = dsir.bucket_counts_pandas if pandas_form else dsir.bucket_counts
            score = dsir.dsir_log_weights_pandas if pandas_form else dsir.dsir_log_weights
            return score(
                docs1, bcount(target, DSIR_BUCKETS), bcount(docs1, DSIR_BUCKETS), DSIR_BUCKETS
            )

        for key, form in (("fused_pandas_sf1", True), ("explode_join_sf1", False)):
            t0 = _time.time()
            run1(form).write.format("noop").mode("overwrite").save()
            out[key] = round(_time.time() - t0, 3)
    return out


def _sf1_dir() -> str | None:
    """The validated sf1 directory for crossover rows, or None. Refuse
    to publish some other scale under _sf1 keys if the env override
    reorders the dir list (r12 review)."""
    sf1_dir = (
        os.environ.get("SPARK_GRAFT_BENCH_SF10_DIRS", "/tmp/sf1,/tmp/sf10")
        .split(",")[0]
        .strip()
    )
    if not os.path.isdir(sf1_dir) or _sf_from_dir(sf1_dir) != 1.0:
        return None
    return sf1_dir


def _sf1_corpus(spark):
    """The validated sf1 documents table for crossover rows, or None."""
    from rnadam_spark.sources.tables import load_table

    d = _sf1_dir()
    return None if d is None else load_table(spark, d, "documents", widen=True)


def _strategy_sf1_ab(spark, forms: dict) -> dict[str, float]:
    """Single-shot sf1 rows for a dict of ``key -> (docs1 -> DataFrame)``
    builders — the r14 crossover-decade protocol (VERDICT r13 #5: every
    sf0.1-losing default publishes the decade where it wins in the SAME
    artifact PERF reads). Empty when the deterministic sf1 corpus is
    absent."""
    docs1 = _sf1_corpus(spark)
    if docs1 is None:
        return {}
    return {key: _timed_once(lambda: make(docs1)) for key, make in forms.items()}


def _timed_once(make_df) -> float:
    """One cache-cleared timed run through the noop sink — the _sf1
    crossover-row protocol (min-of-k at sf1 would triple rows that are
    already multi-second; the decade, not the third decimal, is the
    published fact)."""
    import time as _time

    df = make_df()
    df.sparkSession.catalog.clearCache()
    t0 = _time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(_time.time() - t0, 3)


def _timed_em_state(spark, docs, pandas_kernel: bool) -> float:
    """Time one full EM state build (gc collect + cc force), releasing
    the cc cache between repeats so each run pays the real cost."""
    from rnadam_spark.queries.genomics_q import em_state

    def run():
        state = em_state(docs, pandas_kernel=pandas_kernel)
        try:
            state["cc"].write.format("noop").mode("overwrite").save()
        finally:
            state["cc"].unpersist()
            state["edges"].unpersist()  # lazy cache marker, never forced here

    return _min_of_repeats(spark, run)


def _em_loop_ab(spark, docs) -> dict[str, float]:
    """r13 (VERDICT r12 #4): time the 5-iteration EM loop ALONE over a
    pre-built, pre-forced state, isolating the loop residual (the
    flagship's largest remaining sf100 block, ~45s) from the state
    build. checkpoint_every=2 is the loop-unrolled two-iteration plan:
    one eager truncation per two iterations, with the unchecked
    iteration's subtree materializing once inside the next E-step's
    broadcast exchange. The both-decades adoption bar was met on the
    final r13 tree (loop-only min-of-k: every_2 12.14 vs 13.73s at
    sf10, 58.29 vs 61.57s at sf100 — the §7 data-sized edge cache
    shrank per-iteration work until the eager action dominated), so
    every-2 is now the DEFAULT; this row keeps re-measuring both."""
    from rnadam_spark.algorithms.quantify import em_loop
    from rnadam_spark.queries.genomics_q import K, em_state

    state = em_state(docs)
    out: dict[str, float] = {}
    try:
        # force the cached state ONCE, outside every timed window
        state["cc"].write.format("noop").mode("overwrite").save()
        state["edges"].write.format("noop").mode("overwrite").save()
        for label, every in (("checkpoint_every_1", 1), ("checkpoint_every_2", 2)):
            best = None
            for _ in range(max(REPEATS, 1)):
                # deliberately NO clearCache (unlike _min_of_repeats):
                # evicting the pre-built state would charge its rebuild
                # to the loop under test — and asymmetrically, once per
                # broadcast exchange
                t0 = time.time()
                em_loop(
                    state["class_counts"],
                    state["edges"],
                    state["transcripts"],
                    k=K,
                    max_iterations=5,
                    calibrate_length_bias=False,
                    checkpoint_every=every,
                ).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[label] = round(best, 3)
    finally:
        state["cc"].unpersist()
        state["edges"].unpersist()
    return out


def _lm_vocab_ab(spark, timed, docs) -> dict[str, dict[str, float]]:
    """A/B blocks for the r12 pandas twins: doc-level LM scoring,
    paragraph-level LM scoring (the excise row's unit, split on the
    corpus's ' table ' paragraph convention), and the vocabulary
    kernel. The model trains once on a 10% deterministic sample and is
    released after — both scorer variants time SCORING, not training.
    The trained model is parked in a temp PARQUET, not the session
    cache: _min_of_repeats clears the cache before every repeat, so a
    cached model would silently re-train INSIDE the timed window — and
    asymmetrically (the JVM scorer materializes the uncached training
    subtree once per broadcast exchange, the pandas scorer once per
    collect), biasing the very A/B that picks the default (r12
    review). A bounded-row parquet scan survives clearCache and costs
    the same few ms for both variants."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rnadam_spark.operators import lm as lmod
    from rnadam_spark.operators import text as tmod
    from rnadam_spark.queries.pipeline_q import _PARA_SPLIT

    _tmp = tempfile.mkdtemp(prefix="bench_lm_model_")
    trained = lmod.train_char_lm(docs.filter(F.col("doc_id") % 10 == 0), cache=False)
    trained.write.mode("overwrite").parquet(_tmp)
    model = docs.sparkSession.read.parquet(_tmp)
    try:
        out = {
            "lm_scoring": {
                "hof_join": timed(lambda: lmod.lm_perplexity(docs, model)),
                "pandas_arrow": timed(lambda: lmod.lm_perplexity_pandas(docs, model)),
            },
            "paragraph_ppl": {
                "hof_join": timed(
                    lambda: lmod.paragraph_perplexity(docs, model, split_pattern=_PARA_SPLIT)
                ),
                "pandas_arrow": timed(
                    lambda: lmod.paragraph_perplexity_pandas(
                        docs, model, split_pattern=_PARA_SPLIT
                    )
                ),
            },
            "vocabulary": {
                "runlength_hof": timed(lambda: tmod.vocabulary(docs)),
                "pandas_arrow": timed(lambda: tmod.vocabulary_pandas(docs)),
            },
            # r13: the training pass itself — Counter-partial kernel
            # (em_global_counts' form; the exchange moves
            # vocabulary-bounded partials) vs the explode + codegen
            # hash aggregate. Integer-exact either way (pinned by
            # tests/test_lm.py::test_train_char_lm_kernels_equal);
            # default follows the sf10 measurement (2.2 vs 8.0s)
            "lm_train": {
                "pandas_counter": timed(
                    lambda: lmod.train_char_lm(
                        docs.filter(F.col("doc_id") % 10 == 0), cache=False
                    )
                ),
                "jvm_explode_agg": timed(
                    lambda: lmod.train_char_lm(
                        docs.filter(F.col("doc_id") % 10 == 0),
                        cache=False,
                        kernel="jvm",
                    )
                ),
                # r14 (VERDICT r13 #5): crossover decade
                **_strategy_sf1_ab(
                    spark,
                    {
                        "pandas_counter_sf1": lambda d1: lmod.train_char_lm(
                            d1.filter(F.col("doc_id") % 10 == 0), cache=False
                        ),
                        "jvm_explode_agg_sf1": lambda d1: lmod.train_char_lm(
                            d1.filter(F.col("doc_id") % 10 == 0),
                            cache=False,
                            kernel="jvm",
                        ),
                    },
                ),
            },
        }
        # r13 (VERDICT r12 #6): vocabulary's sf0.1 trade is a
        # coin-flip held by the sf10 win — publish the crossover
        # decade, single timed run per form at sf1
        docs1 = _sf1_corpus(spark)
        if docs1 is not None:
            import time as _time

            for key, make in (
                ("runlength_hof_sf1", lambda: tmod.vocabulary(docs1)),
                ("pandas_arrow_sf1", lambda: tmod.vocabulary_pandas(docs1)),
            ):
                t0 = _time.time()
                make().write.format("noop").mode("overwrite").save()
                out["vocabulary"][key] = round(_time.time() - t0, 3)
    finally:
        shutil.rmtree(_tmp, ignore_errors=True)
    return out


def _contamination_sf1_ab(spark, text, F, bench_mod: int, n: int) -> dict[str, float]:
    """sf1 points for the contamination pandas-vs-JVM trade (keys
    suffixed _sf1 inside ab.contamination_scores). Single timed run per
    form — the JVM side is ~10s at sf1; min-of-k would triple it."""
    import time as _time

    from rnadam_spark.sources.tables import load_table

    sf1_dir = os.environ.get("SPARK_GRAFT_BENCH_SF10_DIRS", "/tmp/sf1,/tmp/sf10").split(",")[0].strip()
    # the row's whole point is pinning the crossover DECADE — refuse to
    # publish some other scale under the _sf1 keys if the env override
    # reorders or truncates the dir list (r12 review)
    if not os.path.isdir(sf1_dir) or _sf_from_dir(sf1_dir) != 1.0:
        return {}
    docs1 = load_table(spark, sf1_dir, "documents", widen=True)
    bench1 = docs1.filter(F.col("doc_id") % bench_mod == 0)
    out: dict[str, float] = {}
    for key, make in (
        ("pandas_arrow_sf1", lambda: text.contamination_scores_pandas(docs1, bench1, n=n)),
        ("jvm_broadcast_sf1", lambda: text.contamination_scores(docs1, bench1, n=n)),
    ):
        t0 = _time.time()
        make().write.format("noop").mode("overwrite").save()
        out[key] = round(_time.time() - t0, 3)
    return out


def _extras_block(spark, sf_dir: str) -> dict[str, float]:
    """Round-6+ operator surface, timed OUTSIDE the headline total (the
    headline set and its total are pinned for round-over-round
    comparability; these rows give the new operators measured numbers
    without moving the comparison baseline). ``lm_perplexity`` includes
    training the char-3-gram LM on a 10% deterministic sample each run
    — the train+score cost is the honest unit a pipeline pays."""
    from pyspark.sql import functions as F

    from rnadam_spark.operators import lm as lmod
    from rnadam_spark.operators import repetition, similarity, text, web
    from rnadam_spark.operators import diffing
    from rnadam_spark.operators import dsir as dsir_mod
    from rnadam_spark.operators import html as html_mod
    from rnadam_spark.operators import multimodal as mmod
    from rnadam_spark.operators import spans as spans_mod
    from rnadam_spark.operators import splits as splits_mod
    from rnadam_spark.operators import sampling as sampling_mod
    from rnadam_spark.operators.sampling import hash_sample
    from rnadam_spark.sources.tables import load_table

    def timed(make_df) -> float:
        return _min_of_repeats(
            spark, lambda: make_df().write.format("noop").mode("overwrite").save()
        )

    docs = load_table(spark, sf_dir, "documents", widen=True)
    weights = spark.createDataFrame(
        [(t, 1.0) for t in ("the", "and", "of", "to", "in")], ["tok", "weight"]
    ).select(lmod.feature_bucket(F.col("tok")).alias("bucket"), "weight")
    model = lmod.train_char_lm(hash_sample(docs, "doc_id", 0.1))
    # model-training cost for the embedding-side extras, paid once (the
    # timed rows measure the recurring per-corpus-pass cost, matching
    # the classifier_score/lm rows' pattern of pre-trained small models)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=8, max_iterations=3)
    books = similarity.train_pq(emb, m=8, nbits=4, max_iterations=3)
    from rnadam_spark.operators import search as search_mod

    return {
        # per-query BM25 cost WITHOUT a maintained stats table: one
        # corpus-stats aggregate + the zero-shuffle scoring pass
        "bm25_topk": timed(
            lambda: search_mod.bm25_topk(docs, "the data system and network", k=10)
        ),
        "c4_clean": timed(lambda: text.c4_clean(docs)),
        # timed() invokes the builder inside the clock, so the CC loop's
        # per-round actions inside semantic_dedup are counted
        "semantic_dedup": timed(
            lambda: similarity.semantic_dedup(
                emb, min_cos=0.98, centroids=cents, max_cell=2000
            )
        ),
        "pq_encode": timed(lambda: similarity.pq_encode(emb, books)),
        "pq_topk": timed(lambda: similarity.pq_topk(emb, 0, books)),
        # the production query path: ADC over the persisted codes table,
        # scan pruned to the probed cells
        "ivfpq_topk_on_codes": timed(
            lambda: similarity.ivfpq_topk_on_codes(
                similarity.pq_encode(emb, books).join(
                    similarity.ivf_cells(emb, centroids=cents), "vec_id"
                ),
                cents[0],  # a trained centroid as a realistic query point
                cents,
                books,
                n_probe=2,
            )
        ),
        "repetition_stats": timed(lambda: repetition.repetition_stats(docs)),
        "dedup_lines": timed(lambda: repetition.dedup_lines(docs)),
        "url_stats": timed(lambda: web.url_stats(docs)),
        # detection + removal in one plan (removal recomputes spans —
        # the honest single-pass cost; L=13 matches the decontamination
        # window so the driver corpus has hittable windows)
        "remove_duplicated_spans": timed(
            lambda: spans_mod.remove_duplicated_spans(docs, min_tokens=13)
        ),
        "redact_pii": timed(lambda: text.redact_pii(docs)),
        "gopher_quality": timed(lambda: text.gopher_quality(docs)),
        # snapshot-monitoring pair, driven over a deterministic halving
        # of the corpus standing in for two snapshot versions
        "corpus_diff": timed(
            lambda: diffing.corpus_diff(
                docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 != 1)
            )
        ),
        "vocabulary_shift": timed(
            lambda: diffing.vocabulary_shift(
                docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
            )
        ),
        # image-modality dedup end-to-end: per-asset dHash (Arrow-batched
        # Python — the one extras row allowed off the JVM) + banded pairs
        "dhash_pairs": timed(
            lambda: mmod.dhash_hamming_pairs(
                mmod.dhash_assets(mmod.assets_from_documents(docs))
            )
        ),
        # audio-modality twin: envelope fingerprint (Arrow-batched
        # Python) + the same 64-bit banding
        "audio_near_pairs": timed(
            lambda: mmod.audio_near_pairs(
                mmod.audio_fingerprint(mmod.assets_from_documents(docs))
            )
        ),
        "lm_train_and_perplexity": timed(lambda: lmod.lm_perplexity(docs, model)),
        "classifier_score": timed(lambda: lmod.classifier_score(docs, weights)),
        "pack_sequences": timed(lambda: lmod.pack_sequences(docs, budget=2048)),
        # round-7 surface: DSIR end-to-end (both bucket distributions +
        # weights + Gumbel-top-k selection — the full selection pass a
        # pipeline pays per corpus), boilerplate extraction over the
        # corpus text wrapped in a synthetic page shell (nav + footer +
        # per-paragraph <p> tags; the shell is constant so the timing
        # isolates the extraction projection), and the split-verdict
        # projection (leakage_safe_split minus its CC input — pair
        # generation and clustering are already timed by the LSH rows)
        "dsir_select": timed(
            lambda: dsir_mod.dsir(
                docs, hash_sample(docs, "doc_id", 0.2, seed=31), fraction=0.25
            )
        ),
        "extract_main_text": timed(
            lambda: html_mod.extract_main_text(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.lit("<nav><a href='/'>Home</a> <a href='/a'>About</a>"
                              " <a href='/b'>More</a></nav><p>"),
                        F.regexp_replace(F.col("text"), "\n", "</p><p>"),
                        F.lit("</p><footer><a href='/t'>Terms</a></footer>"),
                    ).alias("html"),
                )
            )
        ),
        "paragraph_perplexity": timed(
            lambda: lmod.paragraph_perplexity(docs, model)
        ),
        # the two cheap quality signals: entropy is pure-Catalyst
        # in-row; compression is the Arrow-batched Python boundary, so
        # its row measures the real cost of leaving the JVM
        "char_entropy": timed(lambda: text.char_entropy(docs)),
        "compression_signals": timed(lambda: repetition.compression_signals(docs)),
        "assign_split": timed(
            lambda: splits_mod.assign_split(
                docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
            )
        ),
        # UT1-style suffix blocklisting: explode mentioned-domain
        # suffixes + broadcast semi-join + doc_id anti-join
        "blocklist_filter": timed(
            lambda: web.filter_blocklisted_domains(
                docs,
                spark.createDataFrame(
                    [("example.com",), ("tracker.example",), ("bad.site",)],
                    "domain STRING",
                ),
                suffix=True,
            )
        ),
        # exact deterministic per-domain quota without a hot-group window
        "cap_per_domain": timed(
            lambda: sampling_mod.cap_per_group(docs, "source", 20, "doc_id")
        ),
        # r12: the native ingestion surface, measured end-to-end
        # (derive file from parquet + distributed write + native parse
        # — the same composite the gate rows hash-verify); parallelism
        # is the written shard count, see sources/bio_formats.py
        **{
            f"ingest_{fmt}": timed(
                lambda fmt=fmt: _ingest_q(spark, sf_dir, fmt)
            )
            for fmt in ("fastq", "sam", "gtf")
        },
    }


def _ingest_q(spark, sf_dir: str, fmt: str):
    from rnadam_spark.queries import ingest_q

    fn = {
        "fastq": ingest_q.fastq_ingest,
        "sam": ingest_q.sam_ingest,
        "gtf": ingest_q.gtf_ingest,
    }[fmt]
    return fn(spark, sf_dir)


def _quality_block(spark, sf_dir: str) -> dict:
    """recall@k of each approximate retrieval path against brute force —
    the quality number that belongs NEXT TO the speed numbers (an index
    that probes too few cells is fast and useless; publishing both makes
    the approximation trade measurable, the same discipline as the
    timing A/Bs).

    Reading the numbers: the driver's embeddings are random vectors —
    the ANN WORST case (no cluster structure, pairwise cosines
    concentrate near zero, so cell/code assignment carries little
    signal). These recalls are therefore a floor, not a ceiling; the
    spread is the informative part (pq_rerank > raw pq shows the
    two-stage recall repair working; ivf tracks ~n_probe/n_centroids of
    the corpus scanned, as theory says it must on structureless
    data)."""
    from rnadam_spark.operators import similarity
    from rnadam_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    qid = 0
    q_vec = list(
        emb.filter(f"vec_id = {qid}").select("embedding").collect()[0].embedding
    )
    exact = similarity.brute_force_topk(emb, qid, k=20)
    cents = similarity.kmeans_centroids(emb, k=8, max_iterations=3)
    books = similarity.train_pq(emb, m=8, nbits=4, max_iterations=3)
    rest = emb.filter(f"vec_id != {qid}")
    paths = {
        "ivf_topk": similarity.ivf_topk(emb, qid, n_probe=2, centroids=cents),
        "pq_topk": similarity.pq_topk(emb, qid, books, k=20),
        "pq_rerank": similarity.exact_rerank(
            similarity.pq_topk_on_codes(
                similarity.pq_encode(rest, books), q_vec, books, k=100
            ),
            rest,
            q_vec,
            k=20,
        ),
    }
    out = {}
    for name, approx in paths.items():
        r = similarity.ann_recall(approx, exact).collect()[0]
        out[f"{name}_recall_at_{r.k}"] = r.recall
    emb.unpersist()
    # LSH banding recall vs brute-force shingle Jaccard on a 20%
    # deterministic document sample (the near-dup pipeline's quality
    # number — banding trades recall for scale, so publish the trade)
    from rnadam_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents", widen=True)
    rep = dedup.candidate_recall(docs, threshold=0.8, sample_fraction=0.2)
    out["lsh_candidate_recall"] = rep["recall"]
    out["lsh_candidate_precision"] = rep["precision"]
    out["lsh_truth_pairs_in_sample"] = rep["n_true"]
    return out


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _min_of_repeats(spark, run) -> float:
    """Best of REPEATS cache-cleared executions (noise-spike immune)."""
    best = None
    for _ in range(max(REPEATS, 1)):
        spark.catalog.clearCache()
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


SCALING_QUERIES = (
    "kmer_count",
    "lsh_candidate_pairs",
    "quality_scores",
    "em_quantify",
    # the round-8 plans whose 100 TB arguments are structural (suffix
    # broadcast-join, threshold-refinement window, broadcast-CASE +
    # in-row explode) — measured slopes so the arguments carry numbers
    "cap_per_domain",
    "blocklist_suffix",
    "mixture_sample",
)


def _scaling_block(spark, sf_dir: str, queries: dict, timings: dict[str, float]) -> dict:
    """Measured scale-up slopes for representative operators: time at
    ``sf_dir`` divided by time at the 10×-smaller twin directory — the
    direct evidence behind the 100 TB design claims (a slope ≤ 10 means
    at-worst-linear growth over this decade of data; well below 10
    means the fixed per-job cost still dominates at the small end, so
    the distributed fraction is scaling sublinearly). The large-side
    numbers reuse the already-measured headline timings where the query
    is a headline query; non-headline rows measure the large side here
    with the same min-of-k protocol. Empty when no smaller twin exists.

    Caveat recorded with the numbers: ``mixture_sample`` holds its token
    budget FIXED across scales (the gate row's 40k-token budget), so its
    small/large pair compares upsampling at sf0.01 against downsampling
    at sf0.1 — the slope measures the plan's scan+explode cost growth,
    not a fixed-rate workload."""
    sf = _sf_from_dir(sf_dir)
    if sf <= 0:
        return {}
    small_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), f"sf{sf / 10:g}")
    if not os.path.isdir(small_dir):
        return {}
    out: dict[str, dict[str, float]] = {}
    large = dict(timings)  # local copy: never mutate the headline totals
    for name in SCALING_QUERIES:
        if name not in queries:
            continue
        fn = queries[name]
        if name not in large:
            large[name] = _min_of_repeats(
                spark,
                lambda: fn(spark, sf_dir).write.format("noop").mode("overwrite").save(),
            )
        t_small = _min_of_repeats(
            spark,
            lambda: fn(spark, small_dir).write.format("noop").mode("overwrite").save(),
        )
        out[name] = {
            "small_sec": t_small,
            "large_sec": large[name],
            "slope_vs_10x_data": round(large[name] / max(t_small, 1e-9), 2),
        }
    return out


def _sf10_scaling_block(spark, queries: dict) -> dict:
    """Cross-decade slopes sf1→sf10 for representative headline rows —
    the numbers behind the 100 TB extrapolation, living in the artifact
    instead of SURVEY prose. Runs only when the deterministic scale
    corpora exist (tools/make_scale_corpus.py writes them to /tmp/sf1
    and /tmp/sf10; the driver's own sf dirs stop at sf0.1). Single
    timed run per (query, scale) — min-of-k at 60M-row scale would
    triple a cost that is already minutes — under a wall-clock budget;
    rows skipped when the budget runs out are RECORDED, never silently
    dropped.

    Exception (r14, VERDICT r13 #1): ``lsh_candidate_pairs`` is
    min-of-2 per scale — its single-shot sf10 row was the round's one
    unconfirmed claim (25.9 → 29.31s in the r13 driver artifact while
    controlled interleaved min-of-3 read 4.85s; both sessions recorded
    the same end-of-long-bench variance signature on this row), and
    2×(sf1+sf10) ≈ 2×13s fits the 240s budget. The row records its
    ``repeats``. The block also publishes the grouped-vs-inrow
    decision evidence at sf10 itself (``strategy_ab``), so the
    registered default's adoption measurement lives in the driver's
    artifact, not only in the builder's session logs."""
    import time as _time

    dirs = os.environ.get("SPARK_GRAFT_BENCH_SF10_DIRS", "/tmp/sf1,/tmp/sf10")
    sf1_dir, sf10_dir = (d.strip() for d in dirs.split(","))
    if not (os.path.isdir(sf1_dir) and os.path.isdir(sf10_dir)):
        return {}
    # 240s (was 150): at 150 the flagship's previous-round estimate
    # (sf1+sf10 ≈ 165s) could never pass the start gate after the three
    # cheaper rows, so its cross-decade number went permanently
    # carry-forward (r10 VERDICT #3); 240 admits it while the
    # max-carries cap above bounds staleness if it outgrows even that
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_SF10_BUDGET", "240"))
    # cheap -> expensive, so a tight budget still yields several rows.
    # r14 adds dedup_clusters (probe-fused star rounds) so the driver's
    # artifact carries its cross-decade evidence. paragraph_near_dups
    # was TRIED here and removed after one run: its single-shot row
    # read 156s at the end of the bench session while interleaved
    # min-of-3 on the same tree reads 52s — the same deep-session
    # variance signature as r13's lsh row — AND its cost blew the
    # budget so strategy_ab got skipped; its sf10 evidence lives in
    # OPTIMIZATION_r14.md's equality-swept interleaved measurements
    # instead of a number this block cannot measure honestly.
    names = [
        "kmer_count",
        "lsh_candidate_pairs",
        "lm_perplexity",
        "dedup_clusters",
        "em_quantify",
    ]
    out: dict = {"sf1_dir": sf1_dir, "sf10_dir": sf10_dir, "rows": {}, "skipped": []}
    # the block gates STARTS, so without an estimate one 3-minute query
    # admitted at budget-1s busts the driver's unattended wall clock;
    # the previous artifact's row is the estimate, and when a query no
    # longer fits it is CARRIED FORWARD (annotated, never silently
    # dropped or silently stale) so the artifact stays complete
    prev_rows: dict = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        ) as fh:
            prev_rows = json.load(fh).get("sf10_scaling", {}).get("rows", {})
    except Exception:
        pass
    max_carries = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_CARRIES", "2"))
    # r14: per-name repeat counts (min-of-k); see the docstring
    repeats = {"lsh_candidate_pairs": 2}
    forced_this_run = False
    t0 = _time.time()

    def _timed_min(make_df, k: int) -> float:
        best = None
        for _ in range(max(k, 1)):
            spark.catalog.clearCache()
            t1 = _time.time()
            make_df().write.format("noop").mode("overwrite").save()
            dt = _time.time() - t1
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    for name in names:
        if name not in queries:
            continue
        reps = repeats.get(name, 1)
        prev = prev_rows.get(name)
        est = (
            (prev["sf1_sec"] + prev["sf10_sec"]) * reps
            if prev and "sf1_sec" in prev and "sf10_sec" in prev
            else 60.0
        )
        decision, carried_row = _carry_decision(
            prev, _time.time() - t0 + est > budget, forced_this_run, max_carries
        )
        if decision == "carry":
            out["rows"][name] = carried_row
            continue
        if decision == "skip":
            out["skipped"].append(name)
            continue
        forced = decision == "force"
        if forced:
            forced_this_run = True
        fn = queries[name]
        try:
            sec1 = _timed_min(lambda: fn(spark, sf1_dir), reps)
            sec10 = _timed_min(lambda: fn(spark, sf10_dir), reps)
        except Exception as e:  # a scale-corpus hiccup must not kill the bench
            out["rows"][name] = {"error": str(e)[:200]}
            continue
        row = {
            "sf1_sec": sec1,
            "sf10_sec": sec10,
            "slope_per_decade": round(sec10 / max(sec1, 1e-9), 2),
        }
        if reps > 1:
            row["repeats"] = reps
        if forced:
            row["forced_remeasure_after_carries"] = int((prev or {}).get("carries", 0))
        out["rows"][name] = row
    # r14 (VERDICT r13 #1): the grouped default's adoption evidence at
    # the decade where it was adopted — grouped vs inrow at sf10,
    # min-of-2 each, budget-gated like every row here (skipped rows
    # recorded). The registered row above already measures grouped;
    # this block adds the inrow twin so the artifact itself shows
    # which strategy wins at sf10.
    try:
        lsh_row = out["rows"].get("lsh_candidate_pairs") or {}
        est_inrow = 3 * float(lsh_row.get("sf10_sec") or 15.0)
        if _time.time() - t0 + est_inrow <= budget:
            from rnadam_spark.operators import dedup as _dedup
            from rnadam_spark.queries.pipeline_q import LSH_MAX_BUCKET as _LSH_CAP
            from rnadam_spark.sources.tables import load_table as _load

            docs10 = _load(spark, sf10_dir, "documents", widen=True)
            forms = {
                "lsh_pairs_grouped_sf10": lambda: _dedup.lsh_candidate_pairs(
                    docs10, max_bucket=_LSH_CAP
                ),
                "lsh_pairs_inrow_sf10": lambda: _dedup.lsh_candidate_pairs(
                    docs10, max_bucket=_LSH_CAP, strategy="inrow"
                ),
            }
            # INTERLEAVED rounds, min per form: a sequential min-of-2
            # block let the first form eat the whole warm-up tail (the
            # r14 round measured grouped 7.26 sequential vs 4.87
            # interleaved on the same tree minutes apart, with inrow
            # steady at ~6.3 — alternation is the protocol that
            # survives this host's regime drift)
            best: dict[str, float] = {}
            for _ in range(3):
                for key, make in forms.items():
                    spark.catalog.clearCache()
                    t1 = _time.time()
                    make().write.format("noop").mode("overwrite").save()
                    dt = _time.time() - t1
                    best[key] = min(best.get(key, dt), dt)
            out["strategy_ab"] = {k: round(v, 2) for k, v in best.items()}
        else:
            out["strategy_ab"] = {"skipped": "budget"}
    except Exception as e:
        out["strategy_ab"] = {"error": str(e)[:200]}
    return out


_CARRY_FLAG_KEYS = (
    "carried_from_previous",
    "carries",
    "forced_remeasure_after_carries",
)


def _carry_decision(
    prev: dict | None, over_budget: bool, forced_this_run: bool, max_carries: int
) -> tuple[str, dict | None]:
    """Whether a cross-decade row is measured, carried, skipped, or
    force-remeasured. A row whose estimate permanently exceeds the
    budget must not be carried forever — its artifact timing would
    never reflect current code after perf changes — so after
    ``max_carries`` consecutive carries the row is re-measured even
    though it busts the budget gate. At most ONE forced row per run
    (``forced_this_run``) bounds the wall-clock overshoot to a single
    row's cost; the others keep carrying with their counters ticking
    and get their forced run in a later invocation."""
    if not over_budget:
        return "measure", None
    if prev is None:
        return "skip", None
    if "sf1_sec" not in prev or "sf10_sec" not in prev:
        # an {"error": ...} (or otherwise timing-less) previous row is
        # NOT history — carrying it would re-present a stale error as a
        # timing artifact for max_carries rounds (r11 ADVICE). No
        # timings also means no budget estimate, so treat as no-history
        # and skip rather than measure into a blown budget.
        return "skip", None
    # legacy artifact rows carried by the pre-counter code have
    # carried_from_previous but no carries key — they are the STALEST
    # rows, so they start at 1, not 0 (r11 review)
    carries = int(
        prev.get("carries", 1 if prev.get("carried_from_previous") else 0)
    )
    if carries < max_carries or forced_this_run:
        base = {k: v for k, v in prev.items() if k not in _CARRY_FLAG_KEYS}
        return "carry", {
            **base,
            "carried_from_previous": True,
            "carries": carries + 1,
        }
    return "force", None


def _await_quiet_host() -> dict:
    """Round-over-round headline drift has twice been traced to ambient
    host load, not plan changes. Instead of benchmarking into a busy
    host and diagnosing afterwards, wait (bounded) for the 1-min load
    to fall under a threshold; if the budget runs out, proceed anyway —
    an annotated noisy artifact beats a missing one — and record
    exactly what happened so the reader can weigh the numbers."""
    import time as _time

    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    # r12 post-mortem: the r12 driver artifact started at 1-min load
    # 1.58 but 5-min load 8.1 — the host was mid-settle after a burst,
    # the single 1-min sample slipped under the gate, and every row
    # inflated 1.2-8.8x. Two fixes (judge r12 #2): gate on the 5-min
    # average too, and require TWO consecutive quiet samples 15s apart
    # so one momentary dip can't open the gate.
    threshold5 = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD5", "4.0"))
    # modest default: the driver runs bench unattended, and a long stall
    # risks its timeout more than residual load risks the numbers —
    # but the 5-min average decays slowly (8 -> 4 takes ~3.5 min), so
    # the budget is wider than r12's 240s
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_SEC", "480"))
    waited = 0.0
    start_load = [round(x, 2) for x in os.getloadavg()]

    def _quiet() -> bool:
        l1, l5, _ = os.getloadavg()
        return l1 <= threshold and l5 <= threshold5

    consecutive = 1 if _quiet() else 0
    while consecutive < 2 and waited < budget:
        _time.sleep(15)
        waited += 15
        consecutive = consecutive + 1 if _quiet() else 0
    final = [round(x, 2) for x in os.getloadavg()]
    return {
        "threshold": threshold,
        "threshold5": threshold5,
        "load_when_invoked": start_load[0],
        "loadavg_when_invoked": start_load,
        "loadavg_when_opened": final,
        "waited_sec": round(waited, 1),
        "proceeded_under_load": consecutive < 2,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_gate = _await_quiet_host()
    # ambient load BEFORE the bench itself saturates the cores — the
    # 1-min average is the "was the host already busy" diagnostic
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    load_all()
    queries = _bench_queries()
    spark = get_spark("rnadam-bench")

    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # Warm the JVM/codegen/parquet-footer paths the headline set uses by
    # running the same queries once at the smallest scale factor; the
    # measured loop below then reflects steady-state per-query cost
    # instead of charging one-time session startup to whichever query
    # happens to run first.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warmup must never fail the bench

    # Stage-by-stage blocks run BEFORE the measured headline loop: they
    # execute the full index+EM pipeline at sf0.1, which finishes JIT
    # (C2) compilation of the hot EM operators — measured repeatedly,
    # the headline em_quantify read ~1.6s slower when timed before this
    # warm-up than after it (same plan, same data). Min-of-k can't
    # erase tiered-compilation warmup, so the protocol hoists it.
    stages = _stage_blocks(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        timings[name] = _min_of_repeats(
            spark,
            lambda: fn(spark, sf_dir).write.format("noop").mode("overwrite").save(),
        )

    ab = _ab_blocks(spark, sf_dir)
    extras = _extras_block(spark, sf_dir)
    scaling = _scaling_block(spark, sf_dir, queries, timings)
    sf10_scaling = _sf10_scaling_block(spark, queries)
    quality = _quality_block(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    # Detail blocks print FIRST on their own line (and to a sidecar
    # file): the driver captures a bounded tail of stdout and parses the
    # LAST line as the artifact, and the r7 artifact lost its headline
    # total when the single combined line outgrew that tail. The final
    # line stays small — headline total + per-query timings only.
    detail = {
        "metric": "headline_detail",
        "quality": quality,
        "stages": stages,
        "ab": ab,
        "extras": extras,
        "scaling": scaling,
        "sf10_scaling": sf10_scaling,
        # round-over-round headline drift has twice been traced to host
        # load, not plan changes (uniform inflation across the LIGHT
        # queries is the signature); publishing the AMBIENT 1/5/15-min
        # load averages sampled before the bench saturates the cores
        # makes that diagnosis a recorded number instead of a per-round
        # forensic exercise
        "host_loadavg_at_start": loadavg_start,
        "load_gate": load_gate,
    }
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # the sidecar is a convenience, never a bench failure
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "repeats": REPEATS,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
