"""Fused streaming curation chain (streaming/curate.py): join-free,
stateless, checkpoint-incremental."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rnadam_spark import cli
from rnadam_spark.plans.checks import count_shuffles
from rnadam_spark.sources.tables import load_table
from rnadam_spark.streaming import events as se
from rnadam_spark.streaming.curate import curate_stream_chain


def test_chain_stream_matches_batch(spark, sf_dir):
    stream_docs = se.read_table_stream(spark, sf_dir, "documents")
    got = se.run_to_memory(
        curate_stream_chain(stream_docs, quality_min=0.5, use_c4=False),
        "fused_curate_out",
    )
    s = {tuple(r) for r in got.collect()}
    b = {
        tuple(r)
        for r in curate_stream_chain(
            load_table(spark, sf_dir, "documents"), quality_min=0.5, use_c4=False
        ).collect()
    }
    assert s == b and s


def test_chain_is_pure_projection(spark, sf_dir):
    # the whole point vs the batch CLI's join composition: zero
    # exchanges, so the streaming plan holds no state at all
    docs = load_table(spark, sf_dir, "documents")
    df = curate_stream_chain(docs, quality_min=0.9, use_c4=True, chunk_chars=512)
    assert count_shuffles(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan


def test_chain_chunked_matches_operator(spark, sf_dir):
    # inline chunk explosion must agree with the batch chunk_documents
    # operator on the same cleaned text
    from rnadam_spark.operators import text as tx

    docs = load_table(spark, sf_dir, "documents")
    fused = curate_stream_chain(docs, quality_min=0.5, use_c4=False, chunk_chars=512)
    cleaned = curate_stream_chain(docs, quality_min=0.5, use_c4=False)
    via_op = tx.chunk_documents(cleaned, max_chars=512, overlap=128)
    a = {(r.doc_id, r.chunk_idx, r.text) for r in fused.collect()}
    b = {(r.doc_id, r.chunk_idx, r.chunk_text) for r in via_op.collect()}
    assert a == b and a


def test_cli_curate_stream_incremental(spark, tmp_path):
    # two arrival waves: the second run processes ONLY the new files
    # (checkpoint-incremental ingest), output accumulates both
    docs_dir = tmp_path / "arrivals"
    docs_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def jsonl(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    good = ("A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?")
    jsonl(docs_dir / "w1.json", [
        {"doc_id": 1, "text": good, "lang": "en", "source": "web", "n_chars": len(good)},
        {"doc_id": 2, "text": "code { brace }", "lang": "en", "source": "web", "n_chars": 14},
    ])
    cli.main(["curate-stream", str(docs_dir), out, ckpt, "-quality_min", "0.0"])
    first = spark.read.parquet(out)
    assert {r.doc_id for r in first.collect()} == {1}  # brace page dropped

    jsonl(docs_dir / "w2.json", [
        {"doc_id": 3, "text": good, "lang": "de", "source": "web", "n_chars": len(good)},
    ])
    cli.main(["curate-stream", str(docs_dir), out, ckpt, "-quality_min", "0.0"])
    second = spark.read.parquet(out)
    assert {r.doc_id for r in second.collect()} == {1, 3}
    # doc 1 appears exactly once: wave 1's file was not reprocessed
    assert second.filter(F.col("doc_id") == 1).count() == 1


def test_cli_curate_stream_parquet_format(spark, tmp_path):
    good = ("A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?")
    arrivals = tmp_path / "pq_arrivals"
    arrivals.mkdir()
    spark.createDataFrame(
        [(1, good, "en", "web", len(good))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(str(arrivals / "w1"))
    # the file stream watches a flat dir; move the data file up
    import glob
    import shutil

    for f in glob.glob(str(arrivals / "w1" / "*.parquet")):
        shutil.move(f, str(arrivals / "wave1.parquet"))
    shutil.rmtree(str(arrivals / "w1"))

    out = str(tmp_path / "pq_out")
    ckpt = str(tmp_path / "pq_ckpt")
    cli.main(["curate-stream", str(arrivals), out, ckpt,
              "-format", "parquet", "-quality_min", "0.0"])
    back = spark.read.parquet(out)
    assert {r.doc_id for r in back.collect()} == {1}
    assert "quality" in back.columns


def test_cli_curate_stream_warc_incremental(spark, tmp_path):
    # the full streaming crawl pipeline through the CLI: WARC shards
    # arrive in two waves; each availableNow run curates exactly the
    # new shards and appends — crawl to curated parquet, no state
    from tests.test_warc import _warc_file

    shards = tmp_path / "warc_arrivals"
    shards.mkdir()
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    (shards / "w1.warc").write_text(_warc_file())
    cli.main([
        "curate-stream", str(shards), out, ckpt,
        "-format", "warc", "-quality_min", "-10", "-no_c4",
    ])
    first = spark.read.parquet(out)
    assert first.count() == 1
    r = first.collect()[0]
    assert r.url == "http://example.com/page"
    assert "quick brown fox" in r.text and "Home" not in r.text

    (shards / "w2.warc").write_text(_warc_file().replace("example.com", "two.org"))
    cli.main([
        "curate-stream", str(shards), out, ckpt,
        "-format", "warc", "-quality_min", "-10", "-no_c4",
    ])
    both = spark.read.parquet(out)
    assert both.count() == 2  # second run appended only the new shard
    assert {r.url for r in both.collect()} == {
        "http://example.com/page", "http://two.org/page"
    }


def test_chain_blocklist_stream_matches_batch_operator(spark, sf_dir):
    # the streaming blocklist gate (stream-static broadcast nested-loop
    # anti-join on the in-row suffix array) must (a) run as a genuine
    # stream and (b) keep exactly the docs the BATCH operator keeps
    from rnadam_spark.operators.web import filter_blocklisted_domains

    docs = load_table(spark, sf_dir, "documents")
    # synthesize a url-bearing text deterministically; block one source
    # family via subdomain suffix
    synth = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" see https://cdn."),
            F.col("source"),
            F.lit(".example.net/x now"),
        ),
    )
    bl = spark.createDataFrame(
        [("src3.example.net",), ("src7.example.net",)], "domain STRING"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        synth.write.mode("overwrite").parquet(td + "/docs")
        stream = spark.readStream.schema(synth.schema).parquet(td + "/docs")
        got = se.run_to_memory(
            curate_stream_chain(stream, quality_min=0.0, use_c4=False, blocklist=bl),
            "bl_stream_out",
        )
        s = {r.doc_id for r in got.collect()}
    kept_batch = {
        r.doc_id for r in filter_blocklisted_domains(synth, bl, suffix=True).collect()
    }
    assert s == kept_batch and s
    assert not any(
        r.source in ("src3", "src7")
        for r in synth.join(
            spark.createDataFrame([(i,) for i in s], "doc_id BIGINT"), "doc_id"
        ).collect()
    )


def test_cli_curate_stream_blocklist(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)
    good = ("A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!")
    rows = [
        (1, good + " see https://x.blocked.org/a", "en", "s1", 100),
        (2, good + " see https://fine.example.org/b", "en", "s2", 100),
    ]
    with open(src + "/batch1.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(dict(zip(
                ["doc_id", "text", "lang", "source", "n_chars"], r))) + "\n")
    blpath = str(tmp_path / "bl.txt")
    with open(blpath, "w") as f:
        f.write("blocked.org\n")
    cli.main([
        "curate-stream", src, out, ckpt,
        "-quality_min", "0.0", "-no_c4", "-blocklist", blpath,
    ])
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {2}


def test_chain_nfkc_stream_matches_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    synth = docs.withColumn(
        "text", F.concat(F.lit("ﬁrst Ａ１ "), F.col("text"))
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        synth.write.mode("overwrite").parquet(td + "/docs")
        stream = spark.readStream.schema(synth.schema).parquet(td + "/docs")
        got = se.run_to_memory(
            curate_stream_chain(stream, quality_min=0.0, use_c4=False, nfkc=True),
            "nfkc_stream_out",
        )
        s = {tuple(r) for r in got.collect()}
    b = {
        tuple(r)
        for r in curate_stream_chain(
            synth, quality_min=0.0, use_c4=False, nfkc=True
        ).collect()
    }
    assert s == b and s
    # the fullwidth/ligature prefix actually folded
    texts = [
        r.text
        for r in curate_stream_chain(
            synth, quality_min=0.0, use_c4=False, nfkc=True
        ).collect()
    ]
    assert all(t.startswith("first A1 ") for t in texts)


def test_cli_curate_stream_exact_dedup_across_runs(spark, tmp_path):
    # the state store lives in the checkpoint, so a duplicate arriving
    # in a LATER RUN is dropped — cross-run exactly-once dedup
    import os

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    good = ("A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!")
    other = good.replace("first", "different")

    def write_batch(name, rows):
        with open(f"{src}/{name}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(
                    ["doc_id", "text", "lang", "source", "n_chars"], r))) + "\n")

    write_batch("b1", [(1, good, "en", "s", 99), (2, good, "en", "s", 99)])
    cli.main(["curate-stream", src, out, ckpt,
              "-quality_min", "0.0", "-no_c4", "-exact_dedup"])
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert len(first) == 1  # in-batch duplicate collapsed

    write_batch("b2", [(3, good, "en", "s", 99), (4, other, "en", "s", 99)])
    cli.main(["curate-stream", src, out, ckpt,
              "-quality_min", "0.0", "-no_c4", "-exact_dedup"])
    all_docs = {r.doc_id for r in spark.read.parquet(out).collect()}
    # doc 3 duplicates run-1 content -> dropped by checkpointed state;
    # doc 4 is new -> kept
    assert 4 in all_docs and 3 not in all_docs
    assert len(all_docs) == 2


def test_cli_curate_stream_dedup_within_watermark(spark, tmp_path):
    # bounded-state dedup over the WARC path: a same-content re-crawl
    # within the watermark horizon is suppressed; distinct pages pass
    from tests.test_warc import _warc_file

    shards = tmp_path / "warc_w"
    shards.mkdir()
    out = str(tmp_path / "curated_w")
    ckpt = str(tmp_path / "ckpt_w")
    # same page content served from two URLs: content-hash dedup keeps 1
    (shards / "a.warc").write_text(_warc_file())
    (shards / "b.warc").write_text(_warc_file().replace("example.com", "mirror.net"))
    cli.main([
        "curate-stream", str(shards), out, ckpt,
        "-format", "warc", "-quality_min", "-10", "-no_c4",
        "-exact_dedup", "-dedup_within", "7 days",
    ])
    back = spark.read.parquet(out)
    assert back.count() == 1


def test_run_curate_stream_dedup_within_requires_exact_dedup(spark, tmp_path):
    # ADVICE r8: -dedup_within alone used to be silently ignored — a
    # user asking for bounded-horizon dedup got NO dedup with no warning
    import pytest

    from rnadam_spark.sources.tables import load_table
    from rnadam_spark.streaming.curate import run_curate_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="dedup_within requires exact_dedup"):
        run_curate_stream(
            docs,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            dedup_within="7 days",
        )
