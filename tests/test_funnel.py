"""Curation-funnel audit (operators/funnel.py): one-pass stage
attribution must agree with actually running the stages sequentially."""

from __future__ import annotations

from pyspark.sql import functions as F

from rnadam_spark.operators.funnel import curation_funnel
from rnadam_spark.operators.repetition import repetition_stats
from rnadam_spark.operators.text import c4_clean, quality_scores
from rnadam_spark.sources.tables import load_table


def test_funnel_golden(spark):
    rows = [
        # passes everything
        (1, "A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?"),
        # duplicate of 1 -> dropped at exact_dup
        (2, "A first clean normal sentence right here today.\n"
            "A second clean normal sentence right here today!\n"
            "A third clean normal sentence right here today?"),
        # c4 page drop (brace)
        (3, "code { x }\nMore words on this line here.\nThird line of words here."),
        # fails quality (digit soup) but passes c4? -> craft: high digits
        (4, "Numbers 111 222 333 444 555 666 go marching onward.\n"
            "Numbers 777 888 999 000 111 222 go marching onward.\n"
            "Numbers 333 444 555 666 777 888 go marching onward."),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.stage: (r.n_dropped, r.n_remaining) for r in curation_funnel(docs, quality_min=0.9).collect()}
    assert got["input"] == (0, 4)
    assert got["c4"] == (1, 3)          # doc 3
    assert got["quality"][0] == 1       # doc 4
    assert got["repetition"] == (0, 2)  # disabled
    assert got["exact_dup"] == (1, 1)   # doc 2 loses to doc 1


def test_funnel_matches_sequential_pipeline(spark, sf_dir):
    # the funnel judges the text each stage actually SEES in the
    # pipeline — normalize → redact, then quality/repetition/md5 over
    # the scrubbed text — so the sequential reference applies the same
    # standalone operators in the same order
    from rnadam_spark.operators.text import normalize_text, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    qmin, rmax = 0.9, 0.5
    got = {r.stage: r for r in curation_funnel(
        docs, quality_min=qmin, use_c4=False, max_dup_5gram=rmax
    ).collect()}
    n0 = docs.count()
    scrubbed = redact_pii(normalize_text(docs).select("doc_id", "text")).select("doc_id", "text")
    q = quality_scores(scrubbed).filter(F.col("quality") >= qmin).select("doc_id")
    s1 = scrubbed.join(q, "doc_id")
    n1 = s1.count()
    rep = repetition_stats(s1).filter(F.col("dup_5gram_char_frac") <= rmax).select("doc_id")
    s2 = s1.join(rep, "doc_id")
    n2 = s2.count()
    n3 = s2.select(F.md5("text")).distinct().count()
    assert got["input"].n_remaining == n0
    assert got["c4"].n_dropped == 0
    assert got["quality"].n_dropped == n0 - n1
    assert got["repetition"].n_dropped == n1 - n2
    assert got["exact_dup"].n_remaining == n3


def test_audit_matches_actual_run_when_redaction_flips_quality(spark, tmp_path, capsys):
    # VERDICT r6 #3: the funnel must judge the text the pipeline's
    # thresholds see. Doc 1 is digit-heavy in RAW form (three IPv4s →
    # quality < 0.9) but clean after PII redaction (quality > 0.9): a
    # raw-text audit would count it dropped at `quality` while the real
    # run keeps it. Doc 2 genuinely fails quality either way; docs 3/4
    # are exact duplicates of each other.
    import json

    from rnadam_spark import cli
    from rnadam_spark.operators.text import normalize_text, quality_scores, redact_pii

    ip_doc = ("Server logs show 10.20.30.40 and 192.168.100.200 and 172.16.254.1 "
              "with all of the hosts staying online for the whole week there.")
    junk = "1 2 3 4 5 6 7 8 9 !!! ??? ;;; 0 1 2 3 4 5 6 7 8 9 !!! ??? ;;;"
    dup = ("A first clean normal sentence right here today. "
           "A second clean normal sentence right here today!")
    rows = [(i, t, "en", "web") for i, t in
            [(1, ip_doc), (2, junk), (3, dup), (4, dup)]]
    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING"
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, schema).write.parquet(src)

    # precondition: redaction really flips doc 1's verdict at 0.9
    raw_q = {r.doc_id: r.quality for r in quality_scores(
        normalize_text(spark.createDataFrame(rows, schema))
        .select("doc_id", "text")).collect()}
    red_q = {r.doc_id: r.quality for r in quality_scores(
        redact_pii(normalize_text(spark.createDataFrame(rows, schema))
                   .select("doc_id", "text")).select("doc_id", "text")).collect()}
    assert raw_q[1] < 0.9 < red_q[1]

    out = str(tmp_path / "out")
    cli.main(["curate", src, out, "-quality_min", "0.9", "-audit"])
    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 1 in kept  # the pipeline keeps the redacted-clean doc
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    funnel = {f["stage"]: f for f in json.loads(line)["funnel"]}
    assert funnel["quality"]["n_dropped"] == 1          # doc 2 only
    assert funnel["exact_dup"]["n_dropped"] == 1        # one of 3/4
    assert funnel["exact_dup"]["n_remaining"] == len(kept)


def test_funnel_model_stages(spark):
    # optional perplexity/classifier stages (VERDICT r6 next-round #7):
    # corpus-dependent, so the funnel takes the trained artifacts and
    # scores the scrubbed text exactly like the curate CLI
    from pyspark.sql import functions as FF

    from rnadam_spark.operators import lm

    clean = ("the quick brown fox jumps over the lazy dog and runs far away " * 4).strip()
    garbage = "qzxj vkwq jjqx zzvk xqjz wvqk qqzz xxjv kkwq zjqx " * 4
    docs = spark.createDataFrame(
        [(1, clean), (2, clean + " more of the same clean prose"), (3, garbage)],
        ["doc_id", "text"],
    )
    model = lm.train_char_lm(docs.filter("doc_id = 1"))
    ppl = {
        r.doc_id: r.perplexity for r in lm.lm_perplexity(docs, model).collect()
    }
    cut = (max(ppl[1], ppl[2]) + ppl[3]) / 2
    assert ppl[3] > cut > max(ppl[1], ppl[2])
    got = {
        r.stage: (r.n_dropped, r.n_remaining)
        for r in curation_funnel(
            docs, quality_min=0.0, use_c4=False, lm_model=model, max_perplexity=cut
        ).collect()
    }
    assert got["perplexity"] == (1, 2)  # the garbage doc
    assert got["exact_dup"] == (0, 2)

    # classifier stage: a negative weight on the spam token sinks doc 3
    spam = clean + " zzzqq zzzqq zzzqq zzzqq"
    docs2 = spark.createDataFrame(
        [(1, clean), (2, spam)], ["doc_id", "text"]
    )
    weights = spark.range(1).select(
        lm.feature_bucket(FF.lit("zzzqq")).alias("bucket"),
        FF.lit(-5.0).alias("weight"),
    )
    got2 = {
        r.stage: (r.n_dropped, r.n_remaining)
        for r in curation_funnel(
            docs2, quality_min=0.0, use_c4=False, classifier_weights=weights
        ).collect()
    }
    assert got2["classifier"] == (1, 1)  # the spam doc
    assert got2["perplexity"] == (0, 2)  # disabled stage, stable shape


def test_funnel_gopher_stage(spark):
    good = ("The dataset pipeline needs to be clean and it must have documents "
            "that read like prose with normal words of sensible length so the "
            "filters keep them here today. ") * 3
    bullets = "\n".join("• item number " + str(i) for i in range(10))
    docs = spark.createDataFrame([(1, good), (2, bullets)], ["doc_id", "text"])
    got = {
        r.stage: (r.n_dropped, r.n_remaining)
        for r in curation_funnel(
            docs, quality_min=0.0, use_c4=False, use_gopher=True
        ).collect()
    }
    assert got["gopher"] == (1, 1)  # the bullet page
    assert got["exact_dup"] == (0, 1)
    # default off: stage present with zero drops (stable funnel shape)
    off = {
        r.stage: r.n_dropped
        for r in curation_funnel(docs, quality_min=0.0, use_c4=False).collect()
    }
    assert off["gopher"] == 0


def test_audit_applies_nfkc_when_enabled(spark, tmp_path, capsys):
    # ADVICE r8: with -nfkc the funnel used to judge RAW text while the
    # pipeline ran on NFKC text — here a fullwidth variant of doc 1 only
    # collides in exact dedup after NFKC, so a raw-text audit would
    # report zero exact-dup drops while the real run drops one
    import json

    from rnadam_spark import cli

    ascii_doc = ("The committee will meet on Tuesday to review the annual "
                 "budget report and publish the minutes for everyone.")
    fw_doc = "".join(
        chr(ord(c) + 0xFEE0) if "!" <= c <= "~" else c for c in ascii_doc
    )
    assert fw_doc != ascii_doc
    other = ("A completely different second document about gardening and "
             "the proper seasonal care of tomato plants in raised beds.")
    rows = [(1, ascii_doc, "en", "web"), (2, fw_doc, "en", "web"),
            (3, other, "en", "web")]
    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING"
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, schema).write.parquet(src)
    out = str(tmp_path / "out")
    cli.main(["curate", src, out, "-quality_min", "0.0", "-nfkc", "-audit"])
    kept = spark.read.parquet(out).count()
    assert kept == 2  # NFKC makes docs 1/2 exact duplicates
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    funnel = {f["stage"]: f for f in json.loads(line)["funnel"]}
    assert funnel["exact_dup"]["n_dropped"] == 1
    assert funnel["exact_dup"]["n_remaining"] == kept
