"""r13 triage: time the extras-surface operators at a large sf dir
(min-of-2, noop sink) to find which remain expensive at scale.

Usage: python tools/triage_extras_sf10.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rnadam_spark.operators import diffing, repetition, text, web
from rnadam_spark.operators import lm as lmod
from rnadam_spark.operators import multimodal as mmod
from rnadam_spark.operators import sampling as sampling_mod
from rnadam_spark.operators import search as search_mod
from rnadam_spark.operators import spans as spans_mod
from rnadam_spark.operators import splits as splits_mod
from rnadam_spark.operators.sampling import hash_sample
from rnadam_spark.session import get_spark
from rnadam_spark.sources.tables import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    only = set(sys.argv[2:])
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents", widen=True)
    docs.limit(5).write.format("noop").mode("overwrite").save()
    model = lmod.train_char_lm(hash_sample(docs, "doc_id", 0.1))
    weights = spark.createDataFrame(
        [(t, 1.0) for t in ("the", "and", "of", "to", "in")], ["tok", "weight"]
    ).select(lmod.feature_bucket(F.col("tok")).alias("bucket"), "weight")

    rows = {
        "remove_duplicated_spans": lambda: spans_mod.remove_duplicated_spans(
            docs, min_tokens=13
        ),
        "dedup_lines": lambda: repetition.dedup_lines(docs),
        "corpus_diff": lambda: diffing.corpus_diff(
            docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 != 1)
        ),
        "vocabulary_shift": lambda: diffing.vocabulary_shift(
            docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
        ),
        "bm25_topk": lambda: search_mod.bm25_topk(
            docs, "the data system and network", k=10
        ),
        "classifier_score": lambda: lmod.classifier_score(docs, weights),
        "pack_sequences": lambda: lmod.pack_sequences(docs, budget=2048),
        "cap_per_domain": lambda: sampling_mod.cap_per_group(docs, "source", 20, "doc_id"),
        "blocklist_filter": lambda: web.filter_blocklisted_domains(
            docs,
            spark.createDataFrame(
                [("example.com",), ("tracker.example",), ("bad.site",)], "domain STRING"
            ),
            suffix=True,
        ),
        "url_stats": lambda: web.url_stats(docs),
        "c4_clean": lambda: text.c4_clean(docs),
        "redact_pii": lambda: text.redact_pii(docs),
        "gopher_quality": lambda: text.gopher_quality(docs),
        "char_entropy": lambda: text.char_entropy(docs),
        "compression_signals": lambda: repetition.compression_signals(docs),
        "assign_split": lambda: splits_mod.assign_split(
            docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        ),
        "dhash_pairs": lambda: mmod.dhash_hamming_pairs(
            mmod.dhash_assets(mmod.assets_from_documents(docs))
        ),
        "audio_near_pairs": lambda: mmod.audio_near_pairs(
            mmod.audio_fingerprint(mmod.assets_from_documents(docs))
        ),
    }
    out = {}
    for name, mk in rows.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"triage {name}")
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"TRIAGE {name}: {out[name]}", flush=True)
    print("SORTED", dict(sorted(out.items(), key=lambda x: -x[1])))
    spark.stop()


if __name__ == "__main__":
    main()
