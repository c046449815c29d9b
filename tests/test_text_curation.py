"""PII redaction, document chunking, vocabulary (operators/text.py) —
the curation steps between raw scrape and training shards."""

from collections import Counter

from pyspark.sql import functions as F

from rnadam_spark.operators import text


def test_redact_pii_golden(spark):
    rows = [
        (1, "mail me at jane.doe+x@example.org or call +1 (555) 123-4567."),
        (2, "server 10.0.255.3 responded; no pii here otherwise"),
        (3, "clean text with a number 42 that must survive"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert "<EMAIL>" in got[1].text and "<PHONE>" in got[1].text
    assert "jane" not in got[1].text and "555" not in got[1].text
    assert got[1].n_redactions == 2
    assert got[2].text == "server <IP> responded; no pii here otherwise"
    assert got[2].n_redactions == 1
    assert got[3].text == rows[2][1] and got[3].n_redactions == 0


def test_redact_pii_count_equals_replacements(spark):
    rows = [
        # phone-shaped digit run inside an email: ONE replacement
        # (<EMAIL> swallows it), so the audit count must be 1, not 2
        (1, "reach user123 at a.b-c+d123456789@host.com today"),
        # bare digit runs (IDs, timestamps) are not phones — no separator
        (2, "order 123456789012 at 20260813T120000 stays intact"),
        # a real phone with separators still redacts
        (3, "fax: 555-123-4567 ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert got[1].text == "reach user123 at <EMAIL> today"
    assert got[1].n_redactions == 1
    assert got[2].text == rows[1][1] and got[2].n_redactions == 0
    assert got[3].text == "fax: <PHONE> ok" and got[3].n_redactions == 1


def test_redact_pii_partitioning_invariant(spark, sf_dir):
    from rnadam_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {r.doc_id: (r.text, r.n_redactions) for r in text.redact_pii(docs).collect()}
    b = {
        r.doc_id: (r.text, r.n_redactions)
        for r in text.redact_pii(docs.repartition(7)).collect()
    }
    assert a == b and a


def test_chunk_documents_reassembles(spark):
    body = "".join(chr(97 + (i % 26)) for i in range(1000))
    df = spark.createDataFrame([(1, body), (2, "short"), (3, "")], ["doc_id", "text"])
    chunks = text.chunk_documents(df, max_chars=256, overlap=32)
    rows = sorted(chunks.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # stripping the 32-char overlap from every chunk after the first
    # reassembles the original exactly — no gaps, no duplication
    stride = 256 - 32
    rebuilt = by_doc[1][0].chunk_text + "".join(c.chunk_text[32:] for c in by_doc[1][1:])
    assert rebuilt == body
    assert all(c.n_chars <= 256 for c in by_doc[1])
    # consecutive chunks agree on the overlap region
    for prev, nxt in zip(by_doc[1], by_doc[1][1:]):
        assert prev.chunk_text[stride:] == nxt.chunk_text[:32]
    # short and empty docs still appear, as a single chunk
    assert [c.chunk_text for c in by_doc[2]] == ["short"]
    assert [c.chunk_text for c in by_doc[3]] == [""]


def test_chunk_documents_no_redundant_tail(spark):
    # stride = 224; docs whose length lands inside (stride,
    # stride + overlap] used to emit a second chunk fully contained in
    # the first — duplicated training content. Now: exactly 1 chunk.
    df = spark.createDataFrame(
        [
            (1, "x" * 225),  # stride + 1      -> 1 chunk (new char count 1 <= overlap)
            (2, "x" * 256),  # == max_chars    -> 1 chunk
            (3, "x" * 257),  # max_chars + 1   -> 2 chunks (tail adds 1 new char)
        ],
        ["doc_id", "text"],
    )
    chunks = text.chunk_documents(df, max_chars=256, overlap=32)
    n = {r.doc_id: r.n for r in chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert n == {1: 1, 2: 1, 3: 2}
    # and in general no chunk is a pure substring of its predecessor:
    # every chunk after the first ends strictly later than the previous
    rows = sorted(
        chunks.filter(F.col("doc_id") == 3).collect(), key=lambda r: r.chunk_idx
    )
    stride = 256 - 32
    ends = [r.chunk_idx * stride + r.n_chars for r in rows]
    assert all(b > a for a, b in zip(ends, ends[1:]))


def test_vocabulary_matches_counter(spark, sf_dir):
    from rnadam_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    local_tf: Counter = Counter()
    local_df: Counter = Counter()
    for r in docs.collect():
        toks = [t for t in r.text.split() if t]
        local_tf.update(toks)
        local_df.update(set(toks))
    got = {r.token: (r.tf, r.df) for r in text.vocabulary(docs).collect()}
    assert got == {t: (local_tf[t], local_df[t]) for t in local_tf}

    top = text.vocabulary(docs, top_k=10).collect()
    expected_top = sorted(local_tf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.token, r.tf) for r in top] == expected_top


def test_vocabulary_plan_shapes(spark, sf_dir):
    # one groupBy shuffle; the per-doc counts are in-row (run-length)
    from rnadam_spark.plans import count_shuffles
    from rnadam_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert count_shuffles(text.vocabulary(docs)) == 1


def test_fingerprints_matches_python(spark, sf_dir):
    # bottom-4 sketch of 4-shingle poly hashes, cross-checked against a
    # direct Python reimplementation (covers the operator now that its
    # oracle row is retired from the 50-entry gate; the poly-hash kernel
    # itself stays hash-verified via minhash_signatures)
    from rnadam_spark.functions.hashing import BASE, MOD
    from rnadam_spark.sources.tables import load_table

    def py_hash(s: str) -> int:
        acc = ord(s[0])
        for ch in s[1:]:
            acc = (acc * BASE + ord(ch)) % MOD
        return acc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    expected = {}
    for r in docs.collect():
        if len(r.text) < 4:
            continue
        hs = sorted({py_hash(r.text[i : i + 4]) for i in range(len(r.text) - 3)})
        expected[r.doc_id] = "_".join(str(h) for h in hs[:4])
    got = {r.doc_id: r.fingerprint for r in text.fingerprints(docs).collect()}
    assert got == expected and got


def test_contamination_scores_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # fully inside benchmark
            (2, "alpha beta epsilon zeta"),     # partial overlap
            (3, "nothing shared here at all"),  # clean
            (4, "too short"),                   # fewer tokens than n
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["bench_id", "text"]
    )
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contamination)
        for r in text.contamination_scores(docs, bench, n=3).collect()
    }
    # doc 1: grams {a b g, b g d} both in bench -> 1.0
    assert got[1] == (2, 2, 1.0)
    # doc 2: grams {a b e, b e z}; bench has neither -> 0.0... but
    # "alpha beta gamma" is a bench gram, doc2's first gram is
    # "alpha beta epsilon" — no hits
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (3, 0, 0.0)
    assert got[4] == (0, 0, 0.0)  # kept, scored zero — never dropped


def test_contamination_broadcast_plan(spark):
    from rnadam_spark.plans import has_broadcast_join

    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    bench = spark.createDataFrame([(1, "a b c")], ["bench_id", "text"])
    assert has_broadcast_join(text.contamination_scores(docs, bench, n=3))


def test_contamination_sortmerge_parity(spark, sf_dir):
    # broadcast_benchmark=False is the corpus-vs-corpus plan; results
    # must be identical to the broadcast default
    from rnadam_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    a = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contamination)
        for r in text.contamination_scores(docs, bench, n=13).collect()
    }
    b = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contamination)
        for r in text.contamination_scores(
            docs, bench, n=13, broadcast_benchmark=False
        ).collect()
    }
    assert a == b and a
