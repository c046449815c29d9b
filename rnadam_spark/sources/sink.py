"""Curated-corpus sinks: partitioned layout + small-file compaction.

The output side of a 100 TB curation pipeline matters as much as the
operators: a training job reads the curated corpus many times, so the
layout should (a) partition-prune on the columns readers filter by
(lang, source), (b) cluster related rows inside files so row-group
stats prune within files, and (c) avoid the two classic write
pathologies — one giant file per partition (no read parallelism) and
thousands of tiny files (listing + open cost dominates; the "small
files problem").

``maxRecordsPerFile`` bounds file size without an extra exchange;
``sortWithinPartitions`` orders rows inside each task's files so
min/max row-group stats are selective. Compaction rewrites a dataset
that accumulated small files (incremental appends, streaming sinks)
into size-targeted files — the maintenance op every table format
(Delta/Iceberg/Hudi) schedules; here expressed as plain Spark over
parquet directories.
"""

from __future__ import annotations

import posixpath
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    codec: str | None = None,
) -> None:
    """Hive-partitioned parquet sink. ``partition_by`` should be the
    low-cardinality columns readers filter on (partition pruning skips
    whole directories); ``sort_by`` clusters rows within each written
    file so row-group min/max stats prune within files too. ``codec``
    overrides the session parquet compression (e.g. ``"zstd"`` — the
    better size/speed point for text corpora at rest; default stays
    the engine's snappy so existing layouts are byte-stable)."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    w = out.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if codec:
        w = w.option("compression", codec)
    w.partitionBy(*partition_by).parquet(path)


def _qualified_path(spark: SparkSession, path: str):
    """(FileSystem, fully-qualified Path) for ``path`` — qualification
    resolves relative paths against the filesystem working directory so
    they compare cleanly with the absolute paths ``listFiles`` returns."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, fs.makeQualified(jpath)


def _data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(absolute file path, bytes) for every parquet data file under
    ``path``, listed through the Hadoop FileSystem API — the same
    listing works on local FS, HDFS, and object stores (os.walk only
    ever saw the local disk)."""
    fs, jpath = _qualified_path(spark, path)
    it = fs.listFiles(jpath, True)
    files: list[tuple[str, int]] = []
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append((status.getPath().toUri().getPath(), status.getLen()))
    return files


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite an UNPARTITIONED parquet dataset into
    ≈``target_file_bytes`` files; returns the file count written.
    Sizing reads only file metadata (one FileSystem listing — no data
    scan), then one round-robin repartition spreads rows evenly across
    the target count. For Hive-partitioned datasets use
    :func:`compact_partitioned`, which keeps the directory layout."""
    total = sum(size for _f, size in _data_files(spark, path))
    n_files = max(1, round(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    codec: str | None = None,
) -> dict[int, int]:
    """Write the corpus as ``n_shards`` Hive directories
    (``shard=0..n-1``) of parquet, globally pseudo-shuffled, with a
    ``_manifest.json`` recording per-shard row counts. Returns
    {shard: rows}.

    The training-loader contract this serves: (a) every shard is a
    near-equal, independently readable unit, so a 1000-worker data
    loader assigns shards without coordination; (b) shard assignment is
    ``xxhash64(id, seed) mod n`` — deterministic and layout-independent,
    so re-running the pipeline reproduces byte-identical shard
    membership, and changing ``seed`` reshuffles for a new epoch
    ordering; (c) rows WITHIN a shard are sorted by the same hash, so
    consecutive training examples come from unrelated source documents
    (contiguous-source runs defeat shuffle buffers smaller than a
    source's row span).

    Cost shape: one hash-partitioned exchange on the shard key (each
    output file receives its rows directly — no global sort), plus one
    bounded ``groupBy(shard).count()`` for the manifest (n_shards rows
    to the driver). The manifest write goes through the Hadoop
    FileSystem API, so the sink works unchanged on object stores."""
    import json

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast("int")
    sharded = df.withColumn("shard", shard)
    (
        # sort key leads with the shard column: the parquet writer
        # REQUIRES ordering by partition columns and would otherwise
        # insert its own shard-only sort (Catalyst then eliminates this
        # one as redundant, silently restoring source order); leading
        # with shard satisfies the writer, so the hash tiebreak survives
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", F.xxhash64(F.col(id_col), F.lit(seed)))
        .write.mode("overwrite")
        .partitionBy("shard")
        .options(**({"compression": codec} if codec else {}))
        .parquet(path)
    )
    counts = {
        int(r["shard"]): r["n"]
        for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "total_rows": sum(counts.values()),
        "rows_per_shard": {str(k): v for k, v in sorted(counts.items())},
    }
    spark = df.sparkSession
    fs, jpath = _qualified_path(spark, path)
    out = fs.create(spark._jvm.org.apache.hadoop.fs.Path(jpath, "_manifest.json"), True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=2).encode("utf-8")))
    finally:
        out.close()
    return counts


def read_shard_manifest(spark: SparkSession, path: str) -> dict:
    """Read back the ``_manifest.json`` written by
    :func:`write_training_shards` (Hadoop FS, object-store-safe)."""
    import json

    fs, jpath = _qualified_path(spark, path)
    stream = fs.open(spark._jvm.org.apache.hadoop.fs.Path(jpath, "_manifest.json"))
    try:
        # read fully via the JVM-side IOUtils to avoid byte-at-a-time calls
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode("utf-8"))


# ---------------------------------------------------------------------------
# Z-order clustered layout (multi-column data skipping)
# ---------------------------------------------------------------------------


def _numeric_proxy(col: str, dtype: str) -> F.Column:
    """A BIGINT/DOUBLE ordering proxy for a clustering column. Numeric
    and date/timestamp types keep their natural order (casts are
    monotone); anything else clusters by ``xxhash64`` — equal values
    still co-locate (the property dedup/point-lookup skipping needs),
    but range predicates on such a column won't prune, which mirrors
    what every z-order implementation does for unorderable types."""
    base = dtype.split("(")[0]
    if base in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal"):
        return F.col(col).cast("double")
    if base in ("date", "timestamp", "timestamp_ntz"):
        return F.col(col).cast("timestamp").cast("double")
    return F.xxhash64(F.col(col)).cast("double")


def _bucket_code(proxy: F.Column, boundaries: list[float]) -> F.Column:
    """Equi-depth bucket index: the count of quantile boundaries ≤ the
    value, as a balanced binary-search CASE tree — ``bits`` comparisons
    per evaluation (not 2^bits; the first form tried, an
    ``F.aggregate`` fold over a literal array, is a CodegenFallback
    higher-order function that re-runs its 2^bits−1 steps at EVERY
    reference, and the Morton interleave references each code ``bits``
    times). CASE codegens and keeps the whole z-code inside
    whole-stage codegen. NULLs fail every comparison and land in
    bucket 0, clustering together at the low end of the curve."""

    def search(lo: int, hi: int) -> F.Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return (
            F.when(proxy >= F.lit(float(boundaries[mid - 1])), search(mid, hi))
            .otherwise(search(lo, mid - 1))
        )

    return search(0, len(boundaries))


def _interleave_bits(codes: list[F.Column], bits: int) -> F.Column:
    """Morton (z-curve) interleave of equal-width bucket codes, built as
    one literal bitwise expression: bit ``i`` of column ``j`` lands at
    position ``i·n_cols + (n_cols−1−j)``, so high-order bits of every
    column alternate — locality in the code implies locality in EVERY
    clustered column, which is the whole point vs a lexicographic
    sort (tight on the leading column, useless on the rest)."""
    z = F.lit(0).cast("bigint")
    n = len(codes)
    for i in range(bits):
        for j, c in enumerate(codes):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("bigint")
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return z


def zordered(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 0.01,
) -> DataFrame:
    """``df`` plus a ``_zorder`` BIGINT column: each clustering column is
    rank-coded into ``2^bits`` equi-depth buckets (boundaries from one
    ``approxQuantile`` sketch pass — bounded driver state of
    ``len(cols)·(2^bits−1)`` doubles, the same class as the PQ
    codebooks), then the bucket codes are Morton-interleaved. Sorting
    by ``_zorder`` places rows so that parquet min/max footer stats are
    selective on ALL clustered columns at once.

    Equi-depth (not equi-width) bucketing is what makes this survive
    skew at 100 TB: a power-law column still spreads evenly across
    buckets, so no single z-code value captures half the table."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if not 1 <= bits <= 12:
        # the search tree holds 2^(bits+1) CASE nodes per column; 12
        # (4096 buckets) is already far past useful file granularity
        raise ValueError("bits must be in [1, 12]")
    dtypes = dict(df.dtypes)
    proxies = [_numeric_proxy(c, dtypes[c]) for c in cols]
    prep = df.select("*", *[p.alias(f"_zq_{i}") for i, p in enumerate(proxies)])
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    quantiles = prep.approxQuantile(
        [f"_zq_{i}" for i in range(len(cols))], probs, relative_error
    )
    codes = [
        _bucket_code(F.col(f"_zq_{i}"), qs).cast("bigint")
        for i, qs in enumerate(quantiles)
    ]
    return prep.withColumn("_zorder", _interleave_bits(codes, bits)).drop(
        *[f"_zq_{i}" for i in range(len(cols))]
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    bits: int = 8,
    n_files: int | None = None,
    max_records_per_file: int = 1_000_000,
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Z-order clustered parquet sink (Delta ``OPTIMIZE ZORDER BY`` as
    plain Spark): rows are range-partitioned and sorted by their Morton
    code, so every written file covers a compact rectangle of the
    clustered-column space and a selective predicate on ANY clustered
    column skips most files/row-groups via footer stats — the layout
    complement to Hive partitioning (which only prunes on
    low-cardinality directory columns).

    Cost shape: the write pass plus two lighter passes — the quantile
    sketch scans ONLY the clustering columns (its aggregate prunes the
    parquet scan to those fields), and ``repartitionByRange`` runs its
    boundary-sampling job over the input once more (reservoir samples
    per partition; rows are sampled, not all evaluated). Only the
    final exchange+write moves full rows. No window, no driver data
    pass; the z-code is one whole-stage-codegen'd bitwise expression.

    ``bloom_cols``: write a parquet bloom filter for these columns —
    the point-lookup complement to z-order. Min/max footer stats prune
    on the CLUSTERED columns' ranges; a bloom filter prunes row groups
    on ``col = literal`` probes against HIGH-cardinality columns the
    layout wasn't sorted by (e.g. doc_id lookups in a (source,
    quality)-clustered corpus), at a few bits per distinct value of
    file-size cost. ``bloom_ndv`` sizes the filter (expected distinct
    values PER ROW GROUP — overestimating wastes bytes, never
    correctness). Readers that ignore blooms still read the file."""
    z = zordered(df, cluster_by, bits=bits)
    parts = [n_files] if n_files else []
    out = (
        z.repartitionByRange(*parts, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(int(bloom_ndv))
        )
    writer.parquet(path)


def skipping_report(
    spark: SparkSession, path: str, cols: list[str]
) -> dict[str, list[tuple]]:
    """Per-file (min, max) footer stats for ``cols`` — the numbers a
    reader's file/row-group pruning consults. Metadata-only (parquet
    footers via pyarrow, no data scan); the audit that shows whether a
    layout actually skips: for a predicate ``lo ≤ c ≤ hi``, every file
    whose ``[min, max]`` misses ``[lo, hi]`` is never read."""
    import pyarrow.parquet as pq

    stats: dict[str, list[tuple]] = {c: [] for c in cols}
    for f, _size in _data_files(spark, path):
        meta = pq.ParquetFile(f).metadata
        schema_names = {meta.row_group(0).column(i).path_in_schema: i
                        for i in range(meta.num_columns)} if meta.num_row_groups else {}
        for c in cols:
            idx = schema_names.get(c)
            if idx is None:
                continue
            lo, hi = None, None
            for rg in range(meta.num_row_groups):
                s = meta.row_group(rg).column(idx).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats[c].append((f, lo, hi))
    return stats


def files_skipped(report: list[tuple], lo, hi) -> int:
    """How many files a ``lo ≤ c ≤ hi`` predicate would skip, given one
    column's :func:`skipping_report` entries (files with unknown stats
    conservatively count as read, exactly as a reader would)."""
    return sum(
        1
        for _f, fmin, fmax in report
        if fmin is not None and fmax is not None and (fmax < lo or fmin > hi)
    )


def _partition_spec(root: str, file_path: str) -> tuple[tuple[str, str | None], ...]:
    """Parse the Hive ``k=v`` directory segments between ``root`` and a
    data file into ((col, value), ...); unquotes percent-escapes and
    maps the Hive null sentinel to None."""
    rel = posixpath.relpath(posixpath.dirname(file_path), root)
    spec: list[tuple[str, str | None]] = []
    for seg in rel.split("/"):
        if seg in (".", ""):
            continue
        k, _, v = seg.partition("=")
        v = unquote(v)
        spec.append((k, None if v == HIVE_NULL else v))
    return tuple(spec)


def compact_partitioned(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[tuple, int]:
    """Compact a Hive-partitioned parquet dataset WITHOUT flattening it:
    the output reproduces the ``k=v`` directory tree with each partition
    rewritten into ≈``target_file_bytes`` files. Returns
    {partition values: target file count}.

    One distributed job, not a per-directory loop: per-partition target
    counts come from the FileSystem listing (metadata only), ride a
    broadcast join back onto the scan, and a deterministic hash salt
    bounded by each partition's own count spreads rows so one shuffle
    yields ≈n_i same-partition files per partition — a hot partition
    gets more tasks, a tiny one exactly one, and no partition's rewrite
    serializes behind another's (the per-directory-loop alternative
    runs P sequential jobs and leaves the cluster idle on the small
    ones).

    The scan reads partition columns as RAW STRINGS (partition type
    inference disabled for this read): the broadcast join then compares
    the exact decoded directory value on both sides, so values that
    don't round-trip type inference — zero-padded ints (``k=01`` →
    ``1``), trailing-zero decimals, escaped timestamps — can never
    silently miss the join. The rewrite is guarded by an input-vs-
    output row-count check that raises instead of dropping rows, and
    the output reproduces the source directory names byte-for-byte
    (string partition values re-escape identically on write)."""
    root = _qualified_path(spark, path)[1].toUri().getPath()
    sizes: dict[tuple, int] = {}
    for f, size in _data_files(spark, path):
        spec = _partition_spec(root, f)
        sizes[spec] = sizes.get(spec, 0) + size
    if not sizes:
        return {}
    part_cols = [k for k, _v in next(iter(sizes))]
    counts = {
        tuple(v for _k, v in spec): max(1, round(size / target_file_bytes))
        for spec, size in sizes.items()
    }

    inference_conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    saved = spark.conf.get(inference_conf)
    spark.conf.set(inference_conf, "false")
    try:
        # partition discovery happens eagerly here, so the conf can be
        # restored immediately after — the resolved relation keeps its
        # string partition columns for the whole plan lifetime
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(inference_conf, saved)
    data_cols = [c for c in df.columns if c not in part_cols]
    counts_df = spark.createDataFrame(
        [(*vals, n) for vals, n in counts.items()],
        ", ".join([f"`{c}` string" for c in part_cols] + ["`_n_files` int"]),
    )
    # both sides are the decoded directory value (the scan's inference
    # is off; the listing unquotes the same percent-escapes), with the
    # null sentinel standing in for NULL partitions on both sides
    renamed = counts_df.withColumnsRenamed({c: f"_p_{c}" for c in part_cols})
    cond = [
        F.coalesce(df[c], F.lit(HIVE_NULL)) == F.coalesce(F.col(f"_p_{c}"), F.lit(HIVE_NULL))
        for c in part_cols
    ]
    salt = F.pmod(F.xxhash64(*data_cols), F.col("_n_files")) if data_cols else F.lit(0)
    salted = df.join(F.broadcast(renamed), cond).withColumn("_salt", salt)
    total_files = sum(counts.values())
    (
        salted.repartition(total_files, *part_cols, F.col("_salt"))
        .drop("_salt", "_n_files", *[f"_p_{c}" for c in part_cols])
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(out_path)
    )
    n_in, n_out = df.count(), spark.read.parquet(out_path).count()
    if n_in != n_out:
        raise RuntimeError(
            f"compact_partitioned row-count mismatch: read {n_in}, wrote {n_out} "
            f"({path} -> {out_path}) — partition value failed to join; "
            "output is not a faithful compaction"
        )
    return counts
