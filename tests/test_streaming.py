"""Streaming twins must agree with their batch counterparts when driven
over the same (bounded) events data."""

import pytest

from rnadam_spark.queries.windows_q import hourly_event_rollup, sessionize_events
from rnadam_spark.streaming import events as se


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return se.read_events_stream(spark, sf_dir)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, stream_events):
    got = se.run_to_memory(
        se.hourly_rollup_stream(stream_events), "hourly_out", output_mode="append"
    )
    stream = {(r.bucket, r.event_type): (r.n, round(r.total_value, 6)) for r in got.collect()}
    batch = {
        (r.bucket, r.event_type): (r.n, round(r.total_value, 6))
        for r in hourly_event_rollup(spark, sf_dir).collect()
    }
    # append mode emits only windows past the watermark; every emitted
    # window must match batch exactly, and coverage must be substantial
    assert stream
    for key, val in stream.items():
        assert batch[key][0] == val[0], key
    assert len(stream) >= len(batch) - 50  # tail windows may be held back


def test_user_running_stats_stateful_matches_batch(spark, sf_dir, stream_events):
    # custom stateful operator (applyInPandasWithState): after draining
    # the bounded source, the latest per-user snapshot must equal the
    # batch groupBy totals exactly
    from pyspark.sql import functions as F

    from rnadam_spark.sources.tables import load_table

    got = se.run_to_memory(
        se.user_running_stats_stream(stream_events), "user_stats_out", output_mode="update"
    )
    latest: dict[int, tuple[int, float]] = {}
    for r in got.collect():  # update mode: later snapshots supersede
        prev = latest.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            latest[r.user_id] = (r.n_events, round(r.total_value, 6))
    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("total"))
        .collect()
    }
    assert latest == batch


def test_dedup_events_stream_drops_redeliveries(spark, sf_dir):
    # simulate an at-least-once source by unioning the stream with a
    # second read of itself: every event arrives twice; the watermarked
    # dedup must emit each event_id exactly once (= the batch count)
    from rnadam_spark.sources.tables import load_table

    doubled = se.read_events_stream(spark, sf_dir).union(
        se.read_events_stream(spark, sf_dir)
    )
    got = se.run_to_memory(
        se.dedup_events_stream(doubled), "dedup_out", output_mode="append"
    )
    n = got.count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n == n_batch
    assert got.select("event_id").distinct().count() == n_batch


def test_sessionize_stream_matches_batch_session_counts(spark, sf_dir, stream_events):
    got = se.run_to_memory(
        se.sessionize_stream(stream_events), "sessions_out", output_mode="append"
    )
    stream_counts: dict[int, int] = {}
    stream_events_total: dict[int, int] = {}
    for r in got.collect():
        stream_counts[r.user_id] = stream_counts.get(r.user_id, 0) + 1
        stream_events_total[r.user_id] = stream_events_total.get(r.user_id, 0) + r.n_events
    batch_counts: dict[int, int] = {}
    batch_events_total: dict[int, int] = {}
    for r in sessionize_events(spark, sf_dir).collect():
        batch_counts[r.user_id] = batch_counts.get(r.user_id, 0) + 1
        batch_events_total[r.user_id] = batch_events_total.get(r.user_id, 0) + r.n_events
    assert stream_counts
    # users fully past the watermark must agree on session count AND
    # total events in sessions
    agree = 0
    for u, n in stream_counts.items():
        if stream_events_total[u] == batch_events_total[u]:
            assert batch_counts[u] == n, u
            agree += 1
    assert agree >= len(stream_counts) * 0.8


def test_streaming_curation_matches_batch(spark, sf_dir):
    # the stateless curation chain (PII scrub -> quality score ->
    # threshold filter) runs unchanged on an unbounded source and must
    # emit exactly the batch result over the same (bounded) data —
    # declarative projections are engine-mode-agnostic by construction
    from pyspark.sql import functions as F

    from rnadam_spark.operators import text
    from rnadam_spark.sources.tables import load_table

    def curate(docs):
        scrubbed = text.redact_pii(docs)
        quality = text.quality_scores(scrubbed).select("doc_id", "quality")
        return (
            scrubbed.join(quality, "doc_id")
            .filter(F.col("quality") >= 0.9)
            .select("doc_id", "text", "n_redactions", "quality")
        )

    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(curate(stream_docs), "curated_stream_out")
    stream_rows = {r.doc_id: (r.text, r.n_redactions, r.quality) for r in got.collect()}
    batch_rows = {
        r.doc_id: (r.text, r.n_redactions, r.quality)
        for r in curate(load_table(spark, sf_dir, "documents")).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_user_stats_state_timeout_reinitializes(spark, tmp_path):
    # idle_timeout_ms arms ProcessingTimeTimeout: a user idle past the
    # horizon has its state dropped, and a later event re-initializes
    # from zero instead of resuming the old running totals
    import time as _time

    import pandas as pd
    from pyspark.sql import types as T

    src = tmp_path / "stream_src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )

    def write_batch(idx, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, str(src / f"batch{idx}.parquet"))

    write_batch(0, [(1, 10.0), (1, 5.0)])
    events = spark.readStream.schema(schema).parquet(str(src))
    stats = se.user_running_stats_stream(events, idle_timeout_ms=500)
    # NOTE: once a processing-time timeout is armed, the engine keeps
    # scheduling no-data micro-batches to fire expirations, so
    # processAllAvailable() never settles — poll the memory sink with a
    # deadline instead
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("timeout_stats")
        .trigger(processingTime="100 milliseconds")
        .start()
    )

    def wait_for(pred, deadline_s=60.0):
        end = _time.time() + deadline_s
        while _time.time() < end:
            rows = spark.sql("SELECT * FROM timeout_stats").collect()
            if pred(rows):
                return rows
            _time.sleep(0.2)
        raise AssertionError(
            f"stream condition not met within {deadline_s}s: "
            + str(spark.sql("SELECT * FROM timeout_stats").collect())
        )

    try:
        wait_for(lambda rs: any(r.user_id == 1 and r.n_events == 2 for r in rs))
        # idle past the 500ms horizon: a no-data batch fires the
        # timeout and drops user 1's state
        _time.sleep(1.5)
        # user 1 reappears: state re-initializes from zero
        write_batch(1, [(1, 7.0)])
        rows = wait_for(
            lambda rs: any(
                r.user_id == 1 and r.n_events == 1 and r.total_value == 7.0 for r in rs
            )
        )
    finally:
        q.stop()
    user1 = [(r.n_events, r.total_value) for r in rows if r.user_id == 1]
    assert (2, 15.0) in user1          # first window of activity
    assert (1, 7.0) in user1           # re-initialized after timeout
    assert (3, 22.0) not in user1      # did NOT resume the old state


def test_streaming_normalize_repetition_match_batch(spark, sf_dir):
    # the round-6 curation projections (normalization, repetition
    # stats, URL stats) are stateless column expressions — on a file
    # stream they must emit exactly the batch result over the same data
    from rnadam_spark.operators import repetition, text, web
    from rnadam_spark.sources.tables import load_table

    def chain(docs):
        norm = text.normalize_text(docs).select("doc_id", "text")
        rep = repetition.repetition_stats(norm).select(
            "doc_id", "top_2gram_char_frac", "dup_5gram_char_frac"
        )
        urls = web.url_stats(norm).select("doc_id", "n_urls")
        return norm.join(rep, "doc_id").join(urls, "doc_id")

    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(chain(stream_docs), "norm_rep_stream_out")
    stream_rows = {tuple(r) for r in got.collect()}
    batch_rows = {
        tuple(r) for r in chain(load_table(spark, sf_dir, "documents")).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_streaming_c4_and_pq_encode_match_batch(spark, sf_dir):
    # c4_clean and pq_encode are stateless projections against literal
    # rules/codebooks — they run unchanged on a file stream and must
    # emit exactly the batch result (the streaming curation front-door
    # for page filtering and the embedding-compression hot path)
    from rnadam_spark.operators import similarity, text
    from rnadam_spark.sources.tables import load_table

    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(text.c4_clean(stream_docs), "c4_stream_out")
    stream_rows = {tuple(r) for r in got.collect()}
    batch_rows = {
        tuple(r) for r in text.c4_clean(load_table(spark, sf_dir, "documents")).collect()
    }
    assert stream_rows == batch_rows and stream_rows

    books = [[[1.0] * 16, [0.0] * 16, [-1.0] * 16, [0.5] * 16] for _ in range(4)]
    stream_emb = se.read_table_stream(spark, sf_dir, "embeddings")
    got_pq = se.run_to_memory(
        similarity.pq_encode(stream_emb, books), "pq_stream_out"
    )
    s = {(r.vec_id, tuple(r.codes)) for r in got_pq.collect()}
    b = {
        (r.vec_id, tuple(r.codes))
        for r in similarity.pq_encode(load_table(spark, sf_dir, "embeddings"), books).collect()
    }
    assert s == b and s


def test_streaming_dhash_matches_batch(spark, sf_dir):
    # dhash_assets is a stateless Arrow-batched mapInPandas — it
    # composes on an unbounded source like the JVM projections do, so
    # the image-dedup front door (hash arriving assets, pair against a
    # persisted hash store) works at ingest time. Stream the documents
    # table, build the binary asset column in-stream, and require exact
    # agreement with the batch hashes.
    from rnadam_spark.operators import multimodal as mm
    from rnadam_spark.sources.tables import load_table

    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(
        mm.dhash_assets(mm.assets_from_documents(stream_docs)), "dhash_stream_out"
    )
    s = {(r.asset_id, r.dhash) for r in got.collect()}
    b = {
        (r.asset_id, r.dhash)
        for r in mm.dhash_assets(
            mm.assets_from_documents(load_table(spark, sf_dir, "documents"))
        ).collect()
    }
    assert s == b and s


def test_streaming_extract_html_and_split_match_batch(spark, sf_dir):
    # the round-7 crawl/selection projections (HTML main-text
    # extraction, split assignment) are stateless column expressions —
    # on a file stream they emit exactly the batch result, so the
    # warc/extract-html stage slots into the streaming ingest path
    # unchanged
    from pyspark.sql import functions as F

    from rnadam_spark.operators import html as H
    from rnadam_spark.operators import splits
    from rnadam_spark.sources.tables import load_table

    def chain(docs):
        pages = docs.select(
            "doc_id",
            F.concat(
                F.lit("<nav><a href='/x'>x</a><a href='/y'>y</a><a href='/z'>z</a></nav><p>"),
                F.regexp_replace(F.col("text"), "\n", "</p><p>"),
                F.lit("</p>"),
            ).alias("html"),
        )
        extracted = H.extract_main_text(pages, out_col="text")
        return splits.assign_split(
            extracted, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )

    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(chain(stream_docs), "html_split_stream_out")
    stream_rows = {tuple(r) for r in got.collect()}
    batch_rows = {
        tuple(r) for r in chain(load_table(spark, sf_dir, "documents")).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_hourly_rollup_matches_retired_oracle(spark, sf_dir):
    # the round-10-retired gate row's DuckDB oracle, kept exercised
    # here (the tumbling-bucket kernel also stays pinned through the
    # stream-vs-batch twin above)
    import duckdb

    from rnadam_spark.queries.windows_q import _HOURLY_SQL, hourly_event_rollup

    got = {
        (r.bucket.isoformat(), r.event_type, r.n, r.total_value)
        for r in hourly_event_rollup(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        (b.isoformat(), t, n, v) for b, t, n, v in con.execute(_HOURLY_SQL).fetchall()
    }
    assert got == want and got
