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


def test_compact_partitioned_typed_and_padded_partition_values(spark, tmp_path):
    # partition values that do NOT round-trip type inference: zero-
    # padded strings ("01" infers as int 1), plus int and date columns.
    # The compaction join works on raw directory strings, so no value
    # class can silently drop rows (sink.py guards with a count assert).
    from datetime import date

    rows = [
        (i, ["01", "1", "007"][i % 3], i % 4, date(2024, 3, 1 + i % 2), f"payload-{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, pad STRING, bucket INT, day DATE, body STRING")
    frag = str(tmp_path / "typed_frag")
    df.repartition(16).write.partitionBy("pad", "bucket", "day").parquet(frag)

    out = str(tmp_path / "typed_out")
    counts = sink.compact_partitioned(spark, frag, out, target_file_bytes=1 << 30)
    assert counts  # every discovered partition got a target

    back = spark.read.parquet(out)
    assert back.count() == 200
    # zero-padded directories preserved byte-for-byte, not collapsed to pad=1
    assert {d for d in os.listdir(out) if d.startswith("pad=")} == {
        "pad=01", "pad=1", "pad=007"
    }
    # per-partition row counts identical (nothing leaked across dirs)
    a = {
        (r.pad, r.bucket, str(r.day)): r.n
        for r in spark.read.parquet(frag)
        .groupBy("pad", "bucket", "day").agg(F.count("*").alias("n")).collect()
    }
    # the padded source read infers pad=1 for both "1" and "01"... so
    # compare on the compacted side against the RAW directory layout
    raw = (
        spark.read.option("basePath", out).parquet(out)
        .groupBy("pad", "bucket", "day").agg(F.count("*").alias("n"))
    )
    assert sum(r.n for r in raw.collect()) == 200


def test_compact_partitioned_relative_input_path(spark, tmp_path):
    # relative paths resolve against the JVM filesystem working dir;
    # _qualified_path makes the root absolute so _partition_spec's
    # relpath against the absolute listing stays well-formed
    docs = spark.createDataFrame(
        [(i, ["en", "de"][i % 2], f"t{i}") for i in range(50)], "id BIGINT, lang STRING, t STRING"
    )
    frag = tmp_path / "rel_frag"
    docs.repartition(8).write.partitionBy("lang").parquet(str(frag))
    jvm_cwd = spark._jvm.java.lang.System.getProperty("user.dir")
    rel = os.path.relpath(str(frag), jvm_cwd)
    assert not os.path.isabs(rel)
    out = str(tmp_path / "rel_out")
    counts = sink.compact_partitioned(spark, rel, out, target_file_bytes=1 << 30)
    assert counts
    assert spark.read.parquet(out).count() == 50


def test_write_training_shards_roundtrip(spark, tmp_path):
    from rnadam_spark.sources.sink import read_shard_manifest, write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    out = str(tmp_path / "shards")
    counts = write_training_shards(df, out, n_shards=4, seed=7)
    assert sorted(counts) == [0, 1, 2, 3]
    assert sum(counts.values()) == 200
    # near-equal shards: hash split of 200 rows over 4 shards
    assert all(25 <= v <= 75 for v in counts.values()), counts

    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200

    man = read_shard_manifest(spark, out)
    assert man["total_rows"] == 200 and man["n_shards"] == 4 and man["seed"] == 7
    assert sum(man["rows_per_shard"].values()) == 200

    # shard membership is layout-independent and seed-deterministic
    counts2 = write_training_shards(
        df.repartition(13), str(tmp_path / "shards2"), n_shards=4, seed=7
    )
    assert counts == counts2
    a = {r.doc_id: r.shard for r in spark.read.parquet(out).collect()}
    b = {r.doc_id: r.shard for r in spark.read.parquet(str(tmp_path / "shards2")).collect()}
    assert a == b


def test_write_training_shards_intra_shard_order_breaks_source_runs(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob

    from rnadam_spark.sources.sink import write_training_shards

    df = spark.createDataFrame([(i, "x") for i in range(500)], ["doc_id", "text"])
    out = str(tmp_path / "sh")
    write_training_shards(df, out, n_shards=2, seed=1)
    files = glob.glob(out + "/shard=0/*.parquet")
    assert files
    ids = []
    for f in files:
        ids.extend(pq.read_table(f).column("doc_id").to_pylist())
    # hash-sorted within the shard: source order must be destroyed
    assert ids != sorted(ids)
    # different seed -> different membership (reshuffle between epochs)
    c1 = write_training_shards(df, str(tmp_path / "s1"), n_shards=2, seed=1)
    a = {r.doc_id: r.shard for r in spark.read.parquet(str(tmp_path / "s1")).collect()}
    write_training_shards(df, str(tmp_path / "s2"), n_shards=2, seed=2)
    b = {r.doc_id: r.shard for r in spark.read.parquet(str(tmp_path / "s2")).collect()}
    assert a != b


# ---------------------------------------------------------------------------
# Z-order clustered layout
# ---------------------------------------------------------------------------


def _span_fraction(report, lo_hi):
    """Mean per-file (max-min) span as a fraction of the global range."""
    spans = [
        (fmax - fmin) for _f, fmin, fmax in report if fmin is not None
    ]
    glob_lo = min(fmin for _f, fmin, _ in report)
    glob_hi = max(fmax for _f, _, fmax in report)
    return (sum(spans) / len(spans)) / max(1, glob_hi - glob_lo)


def test_zorder_skips_on_both_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    z_out = str(tmp_path / "z")
    lin_out = str(tmp_path / "linear")
    sink.write_clustered(li, z_out, ["l_orderkey", "l_partkey"], bits=6, n_files=16)
    # the lexicographic strawman: range-sorted by the leading column only
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lin_out)
    )

    # faithful: same rows, same values
    back = spark.read.parquet(z_out)
    assert back.count() == li.count()
    assert (
        back.agg(F.sum("l_quantity")).first()[0]
        == li.agg(F.sum("l_quantity")).first()[0]
    )

    zrep = sink.skipping_report(spark, z_out, ["l_orderkey", "l_partkey"])
    lrep = sink.skipping_report(spark, lin_out, ["l_orderkey", "l_partkey"])
    assert len(zrep["l_orderkey"]) >= 8  # really wrote multiple files

    # per-file spans: linear sort is tight on the leading column and
    # ~full-range on the second; z-order is tight-ish on BOTH
    z_span2 = _span_fraction(zrep["l_partkey"], None)
    l_span2 = _span_fraction(lrep["l_partkey"], None)
    assert z_span2 < l_span2 * 0.7, (z_span2, l_span2)

    # predicate-level: a 5%-range filter on the SECOND column skips
    # files under z-order, (almost) none under the linear layout
    keys = sorted(r[0] for r in li.select("l_partkey").collect())
    lo = keys[int(len(keys) * 0.40)]
    hi = keys[int(len(keys) * 0.45)]
    z_skip = sink.files_skipped(zrep["l_partkey"], lo, hi)
    l_skip = sink.files_skipped(lrep["l_partkey"], lo, hi)
    assert z_skip > l_skip, (z_skip, l_skip)
    assert z_skip >= len(zrep["l_partkey"]) // 3
    # ... while staying selective on the first column too
    okeys = sorted(r[0] for r in li.select("l_orderkey").collect())
    z_skip1 = sink.files_skipped(
        zrep["l_orderkey"], okeys[int(len(okeys) * 0.4)], okeys[int(len(okeys) * 0.45)]
    )
    assert z_skip1 >= len(zrep["l_orderkey"]) // 3


def test_zordered_code_properties(spark):
    from rnadam_spark.sources.sink import zordered

    df = spark.createDataFrame(
        [(i, (i * 37) % 100, None if i % 50 == 49 else float(i)) for i in range(200)],
        ["a", "b", "c"],
    )
    z = zordered(df, ["a", "b"], bits=4)
    rows = z.collect()
    assert all(r["_zorder"] is not None for r in rows)
    # deterministic for a fixed layout (re-run agrees exactly); across
    # layouts the approxQuantile sketch may shift a boundary by its
    # relative error, so codes agree except at bucket margins
    again = {r["a"]: r["_zorder"] for r in zordered(df, ["a", "b"], bits=4).collect()}
    assert {r["a"]: r["_zorder"] for r in rows} == again
    # with EXACT quantiles (relative_error=0) codes are fully
    # layout-independent
    ze = {
        r["a"]: r["_zorder"]
        for r in zordered(df, ["a", "b"], bits=4, relative_error=0.0).collect()
    }
    ze2 = {
        r["a"]: r["_zorder"]
        for r in zordered(
            df.repartition(7), ["a", "b"], bits=4, relative_error=0.0
        ).collect()
    }
    assert ze == ze2
    # equal cluster keys get equal codes
    dup = spark.createDataFrame([(1, 2, "x"), (1, 2, "y"), (3, 4, "z")], ["a", "b", "t"])
    codes = {r["t"]: r["_zorder"] for r in zordered(dup, ["a", "b"], bits=3).collect()}
    assert codes["x"] == codes["y"]
    # nulls land in bucket 0 (lowest code block), never error
    zn = zordered(df, ["c", "a"], bits=3).collect()
    null_codes = [r["_zorder"] for r in zn if r["c"] is None]
    assert null_codes and all(nc is not None for nc in null_codes)


def test_zorder_string_column_clusters_equal_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"dom{i % 7}.com") for i in range(400)], ["id", "domain"]
    )
    out = str(tmp_path / "zs")
    sink.write_clustered(df, out, ["domain", "id"], bits=4, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 400
    # every domain's rows concentrate in few files (hash-proxy clustering)
    per = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("domain")
        .agg(F.countDistinct("_f").alias("nf"))
        .collect()
    )
    assert all(r["nf"] <= 4 for r in per), per


def test_write_clustered_bloom_filters(spark, tmp_path):
    # the bloom option must actually reach parquet-mr: the bloomed
    # layout carries the filter bytes (strictly larger files for the
    # same rows) and reads back identically, including a point lookup
    from pyspark.sql import functions as F

    from rnadam_spark.sources.sink import write_clustered

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") * 31 % 89).alias("b"),
    )
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    write_clustered(df, plain, ["a", "b"], bits=5, n_files=4)
    write_clustered(
        df, bloomed, ["a", "b"], bits=5, n_files=4,
        bloom_cols=["doc_id"], bloom_ndv=20000,
    )
    import glob
    import os

    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(p + "/part-*"))
    assert size(bloomed) > size(plain)
    got = spark.read.parquet(bloomed).filter("doc_id = 12345").collect()
    assert len(got) == 1 and got[0].a == 12345 % 97
    assert spark.read.parquet(bloomed).count() == 20000


def test_codec_option_reaches_parquet(spark, tmp_path):
    import glob

    from rnadam_spark.sources.sink import write_partitioned, write_training_shards

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 2).cast("string").alias("lang"),
    )
    write_partitioned(df, str(tmp_path / "z"), ["lang"], codec="zstd")
    import pyarrow.parquet as pq

    f = glob.glob(str(tmp_path / "z" / "lang=0" / "*.parquet"))[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression == "ZSTD"
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == 2000
    counts = write_training_shards(df, str(tmp_path / "s"), 2, codec="zstd")
    assert sum(counts.values()) == 2000
    f2 = glob.glob(str(tmp_path / "s" / "shard=0" / "*.parquet"))[0]
    assert pq.ParquetFile(f2).metadata.row_group(0).column(0).compression == "ZSTD"
