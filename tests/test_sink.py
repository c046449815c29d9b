"""Partitioned sink + compaction (sources/sink.py)."""

import os

from pyspark.sql import functions as F

from rnadam_spark.sources import sink
from rnadam_spark.sources.tables import load_table


def test_write_partitioned_layout_and_file_caps(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "curated")
    sink.write_partitioned(
        docs, out, partition_by=["lang"], sort_by=["source", "doc_id"],
        max_records_per_file=50,
    )
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    batch_langs = {f"lang={r.lang}" for r in docs.select("lang").distinct().collect()}
    assert langs == batch_langs

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # every data file respects the record cap
    per_file = back.groupBy(F.input_file_name().alias("f")).count().collect()
    assert per_file and all(r["count"] <= 50 for r in per_file)

    # partition pruning: a lang filter must scan only that directory
    files = {
        os.path.dirname(r.f)
        for r in back.filter(F.col("lang") == "en")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert all("lang=en" in d for d in files)


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)  # 64 tiny files
    n_before = len(sink._data_files(spark, frag))
    assert n_before >= 64

    out = str(tmp_path / "compacted")
    total = sum(size for _f, size in sink._data_files(spark, frag))
    n_target = sink.compact(spark, frag, out, target_file_bytes=total // 4)
    n_after = len(sink._data_files(spark, out))
    assert n_target == 4
    assert n_after <= 8  # repartition(4) writes at most a few files
    assert spark.read.parquet(out).count() == docs.count()


def test_compact_partitioned_preserves_hive_layout(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "frag_part")
    # fragment every partition: tiny record cap → many small files
    sink.write_partitioned(docs, frag, partition_by=["lang"], max_records_per_file=20)
    files_before = sink._data_files(spark, frag)
    assert len(files_before) > len(
        {d for d in os.listdir(frag) if d.startswith("lang=")}
    )  # genuinely fragmented

    out = str(tmp_path / "compact_part")
    total = sum(size for _f, size in files_before)
    counts = sink.compact_partitioned(spark, frag, out, target_file_bytes=total)
    # layout preserved: same lang= directories, not flattened
    assert {d for d in os.listdir(out) if d.startswith("lang=")} == {
        d for d in os.listdir(frag) if d.startswith("lang=")
    }
    # small partitions compact to their one-file floor
    assert counts and all(n >= 1 for n in counts.values())
    # each partition rewrites into ≤ its target count (hash collisions
    # across shuffle tasks can only merge, never split, file groups)
    n_after = len(sink._data_files(spark, out))
    assert n_after <= sum(counts.values())
    assert n_after < len(files_before)

    # contents identical and pruning still works
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert (
        back.filter(F.col("lang") == "en").count()
        == docs.filter(F.col("lang") == "en").count()
    )
