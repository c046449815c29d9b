"""Streaming curation: the ingest-time curate pipeline as ONE stateless
projection chain.

The batch ``curate`` CLI composes operators with doc_id equi-joins —
fine in batch where Catalyst collapses them, but on an unbounded source
each join of two projections of the same stream becomes a STREAM-STREAM
join: both sides buffer in state forever. This module instead fuses the
stateless stages (normalize → C4 → PII redaction → quality threshold →
optional chunking) into a single ``select`` built from the operators'
exposed expression builders (``text.normalized_column`` /
``c4_columns`` / ``redaction_columns`` / ``quality_columns``), so the
streaming plan has NO stream-stream join, NO aggregation, and NO
state: every microbatch is a pure map over arriving files (plus, with
a blocklist, one stream-STATIC anti-join — stateless by definition),
trivially correct under any watermark and bounded-memory by
construction.

What deliberately does NOT run here: corpus-wide stages (exact dedup,
line dedup, per-group quantile thresholds, mixture resampling) need
global state and belong in the periodic batch pass over the
accumulated corpus — the standard lambda split. The incremental dedup
twins (``dedup.incremental_near_dups``,
``similarity.incremental_semantic_dups``) bridge the gap between batch
passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rnadam_spark.sources.text_io import DOCUMENTS_DDL


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_DDL
) -> DataFrame:
    """JSON-lines directory as a file-stream source (the crawler-dump
    arrival pattern: files land, microbatches pick them up). Schema is
    required — streams cannot infer. Compressed members decode by
    extension, with the same caveat as the batch reader: one
    non-splittable member = one task."""
    return spark.readStream.schema(schema).json(path)


def curate_stream_chain(
    docs: DataFrame,
    quality_min: float = 0.9,
    use_c4: bool = True,
    chunk_chars: int = 0,
    chunk_overlap: int = 128,
    text_col: str = "text",
    blocklist: DataFrame | None = None,
    nfkc: bool = False,
) -> DataFrame:
    """The stateless curation chain as one fused projection; works on
    streaming AND batch DataFrames identically (agreement is pinned by
    tests). Output: the input columns with ``text`` cleaned, plus
    ``n_redactions`` and ``quality`` (and ``chunk_idx`` when chunking).

    Stage order matches the batch CLI: [blocklist] → [NFKC] →
    normalize → [C4 line+page filter] → PII scrub → quality threshold →
    [chunk]. ``nfkc=True`` adds Unicode NFKC canonicalization — an
    Arrow-batched map, stateless, so it slots into the stream
    unchanged.

    ``blocklist`` (a STATIC (domain) DataFrame) adds the UT1
    suffix-semantics gate as the first stage. The batch operator's
    shape (explode suffixes → semi-join → doc_id anti-join back) is
    ILLEGAL here: the offender set derives from the stream, so the
    join-back would be a stream-stream anti-join. Instead the suffix
    array stays IN-ROW and the gate is ONE stream-static broadcast
    nested-loop anti-join on ``array_contains(suffixes, domain)`` —
    stateless (no watermark, no state store), at the price of a
    per-row pass over the broadcast list. That trade caps the sensible
    list size at ingest (thousands of curated domains, not the
    millions-entry UT1 dump — which belongs in the periodic batch pass
    where the equi-join form scales)."""
    from rnadam_spark.operators import text as tx

    cur = docs
    if blocklist is not None:
        from rnadam_spark.operators.web import domains_of, host_suffixes

        bl = F.broadcast(
            blocklist.select(
                F.lower(F.col(blocklist.columns[0])).alias("_domain")
            ).distinct()
        )
        cur = (
            cur.withColumn(
                "_sfx", F.flatten(F.transform(domains_of(text_col), host_suffixes))
            )
            .join(bl, F.expr("array_contains(_sfx, _domain)"), "left_anti")
            .drop("_sfx")
        )
    passthrough = [c for c in docs.columns if c != text_col]
    if nfkc:
        cur = tx.nfkc_normalize(cur, text_col=text_col).drop("n_changed")
    cur = cur.withColumn(text_col, tx.normalized_column(text_col))
    if use_c4:
        c4 = tx.c4_columns(text_col)
        cur = (
            cur.withColumn("_c4_keep", c4["keep_doc"])
            .withColumn(text_col, c4["text"])
            .filter("_c4_keep")
            .drop("_c4_keep")
        )
    cleaned, n_red = tx.redaction_columns(text_col)
    cur = cur.withColumn(text_col, cleaned).withColumn("n_redactions", n_red)
    # staged: tokenize once per row before quality's lambdas read it
    # (see text.gopher_prelude); withColumn chains stay stateless in
    # the stream
    from rnadam_spark.functions.shingles import tokens as _tokens

    cur = (
        cur.withColumn("__qt", _tokens(text_col))
        .withColumn(
            "quality", tx.quality_columns(text_col, toks=F.col("__qt"))["quality"]
        )
        .drop("__qt")
        .filter(F.col("quality") >= quality_min)
    )
    if chunk_chars:
        # row explosion is stateless: posexplode fans each doc into its
        # chunk rows inside the same microbatch; the inline chunk-array
        # builder (shared with batch chunk_documents) keeps passthrough
        # columns on the row without a join
        chunks = tx.chunk_array_column(text_col, chunk_chars, chunk_overlap)
        return cur.select(
            *passthrough,
            "n_redactions",
            "quality",
            F.posexplode(chunks).alias("chunk_idx", text_col),
        ).select(*passthrough, "chunk_idx", text_col, "n_redactions", "quality")
    return cur.select(*passthrough, text_col, "n_redactions", "quality")


def run_curate_stream(
    docs_stream: DataFrame,
    output: str,
    checkpoint: str,
    quality_min: float = 0.9,
    use_c4: bool = True,
    available_now: bool = True,
    blocklist: DataFrame | None = None,
    exact_dedup: bool = False,
    dedup_within: str | None = None,
) -> None:
    """Drive the fused chain to a parquet sink with a checkpoint.
    ``available_now=True`` processes everything currently in the source
    then stops (the incremental-daily-ingest trigger: each run picks up
    exactly the files that arrived since the last checkpoint commit);
    ``False`` runs continuously until the caller stops the query.

    ``exact_dedup=True`` adds STATEFUL cross-batch exact dedup: the
    built-in streaming ``dropDuplicates`` over the cleaned content hash
    keeps one state-store entry per distinct document (16-byte md5
    keys), so a re-crawled page arriving in a LATER file — or a later
    RUN, since the state lives in the checkpoint — is dropped, not
    re-emitted. This is the one deliberately stateful stage in the
    streaming path: state grows with distinct content (the documented
    trade — at crawl scale back the state store with RocksDB and
    compact via the periodic batch pass, which remains the authority
    for near-dup and corpus-global stages).

    ``dedup_within`` (e.g. ``"7 days"``, requires ``exact_dedup`` and a
    ``fetched_at`` event-time column — the WARC path provides one)
    switches to ``dropDuplicatesWithinWatermark``: duplicates are only
    suppressed within the watermark horizon, and state older than it is
    EVICTED — the bounded-state form. The trade is explicit: a
    re-crawl after the horizon re-emits (the periodic batch dedup
    catches it), in exchange for state proportional to one horizon of
    crawl instead of the whole corpus history."""
    if dedup_within is not None and not exact_dedup:
        raise ValueError(
            "dedup_within requires exact_dedup=True (it bounds the exact-dedup "
            "state horizon; alone it would silently do no dedup at all)"
        )
    out = curate_stream_chain(
        docs_stream, quality_min=quality_min, use_c4=use_c4, blocklist=blocklist
    )
    if exact_dedup:
        out = out.withColumn("_h", F.md5(F.coalesce(F.col("text"), F.lit(""))))
        if dedup_within is not None:
            if "fetched_at" not in out.columns:
                raise ValueError(
                    "dedup_within needs a fetched_at event-time column "
                    "(the WARC ingest path provides one)"
                )
            out = (
                out.withColumn("_ts", F.to_timestamp("fetched_at"))
                .withWatermark("_ts", dedup_within)
                .dropDuplicatesWithinWatermark(["_h"])
                .drop("_h", "_ts")
            )
        else:
            out = out.dropDuplicates(["_h"]).drop("_h")
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
