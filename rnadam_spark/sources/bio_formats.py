"""Native genomics formats: FASTA, FASTQ, GTF, 2bit — Spark-first.

Closes the ingestion gap the parquet-table boundary left open
(SURVEY.md §1.4, VERDICT "What's missing #1"): the reference reads its
inputs through ADAM's SAM/BAM/FASTQ/GTF loaders and a 2bit reference
file (rice-cli/.../cli/Quantify.scala:73-94, cli/Index.scala:60-62).
The text formats (FASTA/FASTQ/GTF and plain-text SAM via
``read_sam``), the 2bit binary genome format, and BAM (``read_bam``)
all parse natively here with zero external dependencies, closing the
reference's full input-format surface. BGZF is plain
concatenated gzip members, so stdlib ``gzip.decompress`` inflates a
whole shard; the binary record walk runs in an Arrow-batched
``mapInPandas`` per shard — the same sanctioned Python codec boundary
as the WARC exact splitter and the BMP/WAV decodes. Index-driven
region slices are supported too (``read_bam_region``): tasks seek
straight to the BGZF blocks the sibling ``.bam.bai`` or ``.bam.csi``
names (CSI = the variable min_shift/depth generalization for contigs
beyond 2^29 bp), so a region read costs I/O proportional to the
region, not the shard. Documented boundary within BAM: CRAM —
reference-based compression needs an htslib-class codec stack.

Scale design per format:

- **FASTA** (``read_fasta``): `spark.read.text` with ``lineSep='>'`` —
  the Hadoop line reader splits the FILE at '>' boundaries, so a
  multi-gigabyte uncompressed FASTA still scans as parallel splits
  (records spanning split boundaries are handled by the reader, the
  same mechanism as ordinary newline records). Each record parses
  in-row: first line = header, contig = its first token, sequence =
  the remaining lines concatenated. One projection, no shuffle.
- **FASTQ** (``read_fastq``): records are 4-line groups, and '@' (the
  record sigil) legally appears inside quality strings, so no single
  character is a safe split delimiter. Production FASTQ arrives as
  many (usually gzipped, hence unsplittable anyway) shard files, so
  the honest unit of parallelism is the FILE: ``wholetext`` per shard,
  then an in-row 4-line chunking (``sequence`` + ``transform``), with
  a malformed-framing guard per file. Memory is bounded by shard size
  — the layout every engine is stuck with for .fastq.gz.
- **GTF** (``read_gtf``): plain 9-column TSV → `spark.read.csv` with
  an explicit schema (splittable, predicate-pushdown-friendly);
  attributes parse with ``regexp_extract``. ``transcripts_from_gtf``
  rolls exon rows up to the engine's nested TRANSCRIPTS shape
  (one groupBy), converting GTF's 1-based inclusive coordinates to
  the engine's convention: start = gtf_start − 1 (0-based) and
  end = gtf_end + 1, so the reference's quirky width−1 transcript
  length (SURVEY P9: length = end − start − 1 per exon) equals the
  true exon length gtf_end − gtf_start + 1.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(contig, description, sequence) from FASTA file(s) at ``path``.

    ``contig`` is the first whitespace token of the header line,
    ``description`` the rest (null if none). Sequence lines concatenate
    with all whitespace stripped; empty records (e.g. the text before
    the first '>') are dropped. CRLF-safe."""
    raw = spark.read.option("lineSep", ">").text(path)
    lines = F.split(F.regexp_replace(F.col("value"), "\r", ""), "\n")
    header = F.element_at(lines, 1)
    contig = F.element_at(F.split(F.trim(header), r"\s+"), 1)
    description = F.trim(F.substring(header, F.length(contig) + 1, 2_000_000_000))
    sequence = F.array_join(F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))), "")
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            contig.alias("contig"),
            F.when(F.length(description) > 0, description).alias("description"),
            F.regexp_replace(sequence, r"\s", "").alias("sequence"),
        )
        .filter(F.length("sequence") > 0)
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """(read_name, sequence, plus, quality, source_file) from FASTQ
    shard(s) at ``path`` — one input row per FILE (wholetext; see module
    docstring for why 4-line framing forbids a delimiter split), then
    in-row 4-line chunking. Raises at execution time if any file's
    line count is not a multiple of 4 (truncated shard)."""
    from rnadam_spark.functions.runlength import let_

    # NB: the kwarg form sets the option Spark actually honors; a
    # .option("wholetext", ...) string key silently no-ops
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source_file"), "value"
    )

    # the line array MUST bind once as a lambda variable (let_): spliced
    # inline, the filter+split subtree re-evaluates over the WHOLE FILE
    # at every element_at reference — O(records × file bytes) per shard,
    # measured 191s for a 5k-record file where this form takes ~2s
    # (functions/runlength.py's staging rule; lambdas skip codegen CSE)
    def _frame(lines: Column) -> Column:
        n = F.size(lines)
        return F.when(
            n % 4 == 0, F.transform(
                F.sequence(F.lit(0), (n / 4).cast("int") - 1),
                lambda i: F.struct(
                    F.regexp_replace(F.element_at(lines, i * 4 + 1), "^@", "").alias("read_name"),
                    F.element_at(lines, i * 4 + 2).alias("sequence"),
                    F.element_at(lines, i * 4 + 3).alias("plus"),
                    F.element_at(lines, i * 4 + 4).alias("quality"),
                ),
            )
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("malformed FASTQ (line count % 4 != 0): "), F.col("source_file")
                )
            )
        )

    # trailing newline(s) produce empty tail lines — strip before framing
    framed = let_(
        F.filter(
            F.split(F.regexp_replace(F.col("value"), "\r", ""), "\n"),
            lambda ln: F.length(ln) > 0,
        ),
        _frame,
    )
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select("source_file", F.explode(framed).alias("r"))
        .select("r.read_name", "r.sequence", "r.plus", "r.quality", "source_file")
    )


def reads_from_fastq(fastq: DataFrame) -> DataFrame:
    """Adapt FASTQ records to the engine's READS table shape
    (read_id BIGINT, sequence): read_id is a 64-bit content hash of the
    read name — deterministic across runs and partitionings, unlike the
    reference's zipWithUniqueId ids (SURVEY A4's argument). Collisions
    are the 64-bit birthday bound; quantification counts k-mers and
    never joins on read_id, so a collision cannot change results."""
    return fastq.select(
        F.xxhash64("read_name").alias("read_id"), "sequence"
    )


GTF_SCHEMA = T.StructType(
    [
        T.StructField("contig", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("feature", T.StringType(), False),
        T.StructField("start", T.LongType(), False),  # 1-based inclusive
        T.StructField("end", T.LongType(), False),  # 1-based inclusive
        T.StructField("score", T.StringType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("frame", T.StringType(), True),
        T.StructField("attributes", T.StringType(), True),
    ]
)


def _attr(name: str) -> Column:
    """GTF attribute value: ``name "value";`` (empty string if absent)."""
    return F.regexp_extract(F.col("attributes"), f'{name} "([^"]*)"', 1)


def read_gtf(spark: SparkSession, path: str) -> DataFrame:
    """Flat GTF feature rows with ``gene_id``/``transcript_id``/
    ``exon_id`` parsed out of the attribute column. Plain splittable
    CSV scan — filters on ``feature`` and ``contig`` push down."""
    raw = spark.read.csv(path, sep="\t", schema=GTF_SCHEMA, comment="#")
    return raw.select(
        "contig",
        "source",
        "feature",
        "start",
        "end",
        "strand",
        _attr("gene_id").alias("gene_id"),
        _attr("transcript_id").alias("transcript_id"),
        _attr("exon_id").alias("exon_id"),
    )


def transcripts_from_gtf(gtf: DataFrame) -> DataFrame:
    """Roll GTF exon rows up to the engine's nested TRANSCRIPTS shape
    (t_id, gene_id, strand, exons array), one groupBy. Coordinates
    convert 1-based-inclusive → the engine's exon convention (see
    module docstring); exons sort by start so the hull and the exon
    order are deterministic. Exons with no exon_id attribute get
    ``<transcript_id>.e<k>`` by rank."""
    exons = gtf.filter(F.col("feature") == "exon").select(
        F.col("transcript_id").alias("t_id"),
        "gene_id",
        (F.col("strand") == "+").alias("strand"),
        F.struct(
            F.col("exon_id").alias("exon_id"),
            F.col("contig").alias("contig"),
            (F.col("start") - 1).alias("start"),
            (F.col("end") + 1).alias("end"),
        ).alias("exon"),
    )
    rolled = exons.groupBy("t_id").agg(
        F.first("gene_id").alias("gene_id"),
        F.first("strand").alias("strand"),
        F.array_sort(
            F.collect_list("exon"), lambda a, b: F.when(a["start"] < b["start"], -1)
            .when(a["start"] > b["start"], 1)
            .otherwise(0),
        ).alias("exons"),
    )
    # fill missing exon ids positionally after the sort
    numbered = F.transform(
        F.col("exons"),
        lambda e, i: F.struct(
            F.when(F.length(e["exon_id"]) > 0, e["exon_id"])
            .otherwise(F.concat(F.col("t_id"), F.lit(".e"), (i + 1).cast("string")))
            .alias("exon_id"),
            e["contig"].alias("contig"),
            e["start"].alias("start"),
            e["end"].alias("end"),
        ),
    )
    return rolled.select("t_id", "gene_id", "strand", numbered.alias("exons"))


# ------------------------------------------------ extension dispatch

_FASTA_EXTS = (".fa", ".fasta", ".fa.gz", ".fasta.gz", ".fna", ".fna.gz")
_FASTQ_EXTS = (".fq", ".fastq", ".fq.gz", ".fastq.gz")
_GTF_EXTS = (".gtf", ".gtf.gz", ".gff", ".gff.gz")


def _endswith_any(path: str, exts: tuple[str, ...]) -> bool:
    low = path.rstrip("/").lower()
    return any(low.endswith(e) for e in exts)


def load_genome_any(spark: SparkSession, path: str) -> DataFrame:
    """Genome table from FASTA, 2bit, or parquet, by extension — the
    CLI's ingestion dispatch (native formats are first-class inputs,
    not a conversion step the user runs by hand)."""
    if _endswith_any(path, _FASTA_EXTS):
        return read_fasta(spark, path).select("contig", "sequence")
    if path.rstrip("/").lower().endswith(".2bit"):
        return read_twobit(spark, path)
    from rnadam_spark.sources import genomics

    return genomics.load_genome(spark, path)


def load_transcripts_any(spark: SparkSession, path: str) -> DataFrame:
    """Transcript descriptors from GTF or parquet, by extension."""
    if _endswith_any(path, _GTF_EXTS):
        return transcripts_from_gtf(read_gtf(spark, path))
    from rnadam_spark.sources import genomics

    return genomics.load_transcripts(spark, path)


def load_reads_any(spark: SparkSession, path: str) -> DataFrame:
    """Reads table from FASTQ, SAM, BAM, or parquet, by extension."""
    if _endswith_any(path, _FASTQ_EXTS):
        return reads_from_fastq(read_fastq(spark, path))
    if path.endswith(".bam"):
        return reads_from_bam(read_bam(spark, path))
    if _endswith_any(path, _SAM_EXTS):
        return reads_from_bam(read_sam(spark, path))
    from rnadam_spark.sources import genomics

    return genomics.load_reads(spark, path)


# ---------------------------------------------------------------- BAM

_BAM_MAGIC = b"BAM\x01"
_BAM_SEQ_CODES = "=ACMGRSVTWYHKDBN"  # 4-bit nibble codes per SAM spec §4.2
_BAM_CIGAR_OPS = "MIDNSHP=X"

_BAM_SCHEMA = (
    "read_name string, flag int, contig string, pos bigint, mapq int, "
    "cigar string, sequence string, quality string, source_file string"
)


def _parse_bam_refs(data: bytes) -> tuple[list[str], int]:
    """Reference-name table of an inflated BAM payload and the byte
    offset where alignment records begin."""
    import struct

    if data[:4] != _BAM_MAGIC:
        raise ValueError("not a BAM payload (bad magic)")
    (l_text,) = struct.unpack_from("<i", data, 4)
    at = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, at)
    at += 4
    refs: list[str] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, at)
        at += 4
        refs.append(data[at : at + l_name - 1].decode("ascii"))  # NUL-terminated
        at += l_name + 4  # skip l_ref
    if at > len(data):
        # a short final name slice "succeeds" silently — reject so the
        # incremental header reader keeps inflating instead
        raise ValueError("truncated BAM header")
    return refs, at


def _decode_bam_record(data: bytes, at: int, refs: list[str]) -> tuple[tuple, int]:
    """Decode one alignment record starting at ``at`` (its block_size
    field); returns (record_tuple, offset_after_record)."""
    import struct

    (block_size,) = struct.unpack_from("<i", data, at)
    at += 4
    if block_size <= 0 or at + block_size > len(data):
        raise ValueError(f"truncated BAM record at byte {at - 4}")
    (
        ref_id, pos0, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
        _next_ref, _next_pos, _tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", data, at)
    p = at + 32
    read_name = data[p : p + l_read_name - 1].decode("ascii")
    p += l_read_name
    cigar_ops = struct.unpack_from(f"<{n_cigar}I", data, p)
    cigar = "".join(f"{c >> 4}{_BAM_CIGAR_OPS[c & 0xF]}" for c in cigar_ops) or "*"
    p += 4 * n_cigar
    n_seq_bytes = (l_seq + 1) // 2
    seq_packed = data[p : p + n_seq_bytes]
    # 4-bit packed, high nibble first
    seq = "".join(
        _BAM_SEQ_CODES[
            (seq_packed[j // 2] >> 4) & 0xF if j % 2 == 0 else seq_packed[j // 2] & 0xF
        ]
        for j in range(l_seq)
    )
    p += n_seq_bytes
    qual_raw = data[p : p + l_seq]
    quality = (
        None
        if not l_seq or qual_raw[0] == 0xFF
        else bytes(q + 33 for q in qual_raw).decode("ascii")
    )
    rec = (
        read_name,
        flag,
        refs[ref_id] if 0 <= ref_id < len(refs) else None,
        pos0 + 1 if pos0 >= 0 else None,
        mapq,
        cigar,
        seq,
        quality,
    )
    return rec, at + block_size


def _parse_bam_bytes(data: bytes) -> list[tuple]:
    """Alignment records of one BAM shard (already-inflated bytes):
    (read_name, flag, contig, pos_1based, mapq, cigar, sequence,
    quality). ``contig`` is null for unmapped reads (refID −1);
    ``quality`` is null when absent (0xff fill); ``pos`` converts
    BAM's 0-based to SAM's 1-based so the text and binary forms of the
    same alignment read identically downstream."""
    refs, at = _parse_bam_refs(data)
    out: list[tuple] = []
    n = len(data)
    while at + 4 <= n:
        rec, at = _decode_bam_record(data, at, refs)
        out.append(rec)
    return out


def read_bam(spark: SparkSession, path: str) -> DataFrame:
    """(read_name, flag, contig, pos, mapq, cigar, sequence, quality,
    source_file) from BAM shard(s) at ``path`` — the last reference
    input format (Quantify.scala:73 loads SAM/BAM via ADAM), native.

    Execution model = the FASTQ/WARC-exact shard pattern: binaryFile
    scan (BGZF never splits mid-member anyway), stdlib gzip inflate +
    binary record walk inside Arrow-batched ``mapInPandas``, so
    parallelism is shard count and peak memory one inflated shard per
    task. Plain uncompressed .bam (magic-first) parses too. CRAM and
    index-driven region seeks are the documented boundary (module
    docstring)."""
    import gzip

    import pandas as pd

    cols = (
        "read_name", "flag", "contig", "pos", "mapq",
        "cigar", "sequence", "quality", "source_file",
    )

    def parse(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for sf, content in zip(pdf["source_file"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for rec in _parse_bam_bytes(data):
                    for c, v in zip(cols, (*rec, sf)):
                        out[c].append(v)
            yield pd.DataFrame(out)

    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("source_file"), "content"
    )
    return raw.mapInPandas(parse, _BAM_SCHEMA)


def reads_from_bam(bam: DataFrame) -> DataFrame:
    """Adapt BAM records to the engine's READS table (read_id BIGINT,
    sequence): read_id is ``xxhash64(read_name, flag & 0xC0)`` — a
    NAME hash like :func:`reads_from_fastq`'s, with the pair-segment
    bits (0x40 first-in-pair / 0x80 second-in-pair) mixed in because
    paired-end MATES share a read name and would otherwise collide on
    the same id. Remaining collisions are the 64-bit birthday bound,
    and as with FASTQ they are harmless here: quantification counts
    k-mers and never joins on read_id. Secondary/supplementary
    alignments (flags 0x100/0x800) drop so one physical read
    contributes once, matching what an aligner-agnostic quantifier
    wants."""
    return bam.filter((F.col("flag").bitwiseAND(0x100 | 0x800)) == 0).select(
        F.xxhash64(
            "read_name", F.col("flag").bitwiseAND(0xC0).cast("int")
        ).alias("read_id"),
        "sequence",
    )


# ---------------------------------------------------------------- SAM

_SAM_EXTS = (".sam", ".sam.gz")


def read_sam(spark: SparkSession, path: str) -> DataFrame:
    """(read_name, flag, contig, pos, mapq, cigar, sequence, quality,
    source_file) from plain-text SAM — the text twin of ``read_bam``,
    emitting the SAME schema so the two forms of one alignment read
    identically downstream (pinned by a BAM↔SAM round-trip golden).
    Completes the reference's SAM/BAM/FASTQ loader surface
    (cli/Quantify.scala:73 via ADAM).

    Scale shape: SAM is newline-delimited TSV, so ``spark.read.text``
    gives SPLITTABLE parallel scans of uncompressed multi-GB files (the
    FASTA argument; .sam.gz falls back to per-file parallelism like
    every engine), and the 11 mandatory fields map in one in-row
    projection — no Python boundary at all, unlike the binary walk BAM
    needs. Header lines ('@' prefix) and blank lines drop; a non-header
    line with fewer than 11 tab fields raises with the offending file
    name (the FASTQ malformed-shard stance). Missing-value sentinels
    follow the BAM decoder's conventions: RNAME '*' → null contig,
    POS 0 → null, QUAL '*' → null, SEQ '*' → empty string; optional
    tag columns beyond field 11 are ignored."""
    raw = spark.read.text(path).select(
        # nullif wrapper: schema-parity with read_bam needs a NULLABLE
        # source_file (input_file_name() alone is non-nullable, and a
        # literal-true when() gets constant-folded back to non-nullable)
        F.nullif(F.input_file_name(), F.lit("")).alias("source_file"),
        "value",
    )
    body = raw.filter(
        (F.length(F.trim("value")) > 0) & ~F.col("value").startswith("@")
    )
    fields = F.split("value", "\t")
    ok = F.size(fields) >= 11
    f = body.withColumn(
        "_f",
        F.when(ok, fields).otherwise(
            F.raise_error(
                F.concat(F.lit("malformed SAM line (<11 fields): "), "source_file")
            )
        ),
    )
    el = lambda i: F.element_at("_f", i)  # noqa: E731 — 1-based, mirrors spec column numbers
    return f.select(
        el(1).alias("read_name"),
        el(2).cast("int").alias("flag"),
        F.when(el(3) == "*", F.lit(None)).otherwise(el(3)).alias("contig"),
        F.when(el(4).cast("bigint") <= 0, F.lit(None))
        .otherwise(el(4).cast("bigint"))
        .alias("pos"),
        el(5).cast("int").alias("mapq"),
        el(6).alias("cigar"),
        F.when(el(10) == "*", F.lit("")).otherwise(el(10)).alias("sequence"),
        F.when(el(11) == "*", F.lit(None)).otherwise(el(11)).alias("quality"),
        "source_file",
    ).to(T.StructType.fromDDL(_BAM_SCHEMA))  # exact type parity with read_bam


# ---------------------------------------------------------- BAM + BAI

_BAI_MAGIC = b"BAI\x01"
_CSI_MAGIC = b"CSI\x01"
_LINEAR_SHIFT = 14  # BAI 16 kb linear-index windows
_BAI_MIN_SHIFT, _BAI_DEPTH = 14, 5  # BAI is CSI binning fixed at (14, 5)


def _pseudo_bin(depth: int) -> int:
    # the per-ref unmapped-count metadata bin = max_bin + 2
    # (37450 for BAI's depth 5)
    return ((1 << (depth + 1) * 3) - 1) // 7 + 1


def reg2bin(beg: int, end: int, min_shift: int = _BAI_MIN_SHIFT, depth: int = _BAI_DEPTH) -> int:
    """Finest bin fully containing the 0-based half-open interval
    [beg, end) — the SAM spec §5.3 binning scheme, parameterized the
    CSI way (BAI is the fixed (14, 5) instance: 6 levels, 2^29 max)."""
    end -= 1
    s, t, level = min_shift, ((1 << depth * 3) - 1) // 7, depth
    while level > 0:
        if beg >> s == end >> s:
            return t + (beg >> s)
        level -= 1
        s += 3
        t -= 1 << (level * 3)
    return 0


def _reg2bins(beg: int, end: int, min_shift: int = _BAI_MIN_SHIFT, depth: int = _BAI_DEPTH) -> list[int]:
    """Every bin that may hold an alignment overlapping [beg, end)."""
    end -= 1
    bins = []
    s, t = min_shift + depth * 3, 0
    for level in range(depth + 1):
        bins.extend(range(t + (beg >> s), t + (end >> s) + 1))
        t += 1 << (level * 3)
        s -= 3
    return bins


def _parse_bai(data: bytes) -> dict:
    """BAI index: per-reference (bins, linear_index) where bins maps
    bin number → [(voffset_beg, voffset_end)] chunks and linear_index
    is the 16kb-window minimum-voffset array (SAM spec §5.2)."""
    import struct

    if data[:4] != _BAI_MAGIC:
        raise ValueError("not a BAI index (bad magic)")
    pseudo = _pseudo_bin(_BAI_DEPTH)
    (n_ref,) = struct.unpack_from("<i", data, 4)
    at = 8
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, at)
        at += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_no, n_chunk = struct.unpack_from("<Ii", data, at)
            at += 8
            flat = struct.unpack_from(f"<{2 * n_chunk}Q", data, at)
            at += 16 * n_chunk
            if bin_no != pseudo:
                bins[bin_no] = list(zip(flat[0::2], flat[1::2]))
        (n_intv,) = struct.unpack_from("<i", data, at)
        at += 4
        linear = struct.unpack_from(f"<{n_intv}Q", data, at)
        at += 8 * n_intv
        refs.append({"bins": bins, "linear": linear})
    return {"min_shift": _BAI_MIN_SHIFT, "depth": _BAI_DEPTH, "refs": refs}


def _parse_csi(data: bytes) -> dict:
    """CSI index (CSIv1 spec): like BAI with parameterized
    (min_shift, depth) and a per-bin ``loffset`` virtual-offset lower
    bound in place of the linear index."""
    import struct

    if data[:4] != _CSI_MAGIC:
        raise ValueError("not a CSI index (bad magic)")
    min_shift, depth, l_aux = struct.unpack_from("<iii", data, 4)
    at = 16 + l_aux
    pseudo = _pseudo_bin(depth)
    (n_ref,) = struct.unpack_from("<i", data, at)
    at += 4
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, at)
        at += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        loffsets: dict[int, int] = {}
        for _ in range(n_bin):
            bin_no, loffset, n_chunk = struct.unpack_from("<IQi", data, at)
            at += 16
            flat = struct.unpack_from(f"<{2 * n_chunk}Q", data, at)
            at += 16 * n_chunk
            if bin_no != pseudo:
                bins[bin_no] = list(zip(flat[0::2], flat[1::2]))
                loffsets[bin_no] = loffset
        refs.append({"bins": bins, "loffsets": loffsets})
    return {"min_shift": min_shift, "depth": depth, "refs": refs}


def _parse_bam_index(data: bytes) -> dict:
    """Dispatch on the index magic: BAI or CSI."""
    if data[:4] == _CSI_MAGIC:
        return _parse_csi(data)
    return _parse_bai(data)


def _min_voffset(index: dict, ref: dict, beg0: int) -> int:
    """Coordinate-sort lower bound on the virtual offset of any record
    overlapping a query starting at ``beg0``: BAI reads its 16kb linear
    index; CSI reads the ``loffset`` of the deepest indexed bin
    containing ``beg0``, walking up levels until one is present (the
    htslib iterator's rule)."""
    if "linear" in ref:
        w = beg0 >> _LINEAR_SHIFT
        return ref["linear"][w] if w < len(ref["linear"]) else 0
    loffsets = ref["loffsets"]
    s, t, level = index["min_shift"], ((1 << index["depth"] * 3) - 1) // 7, index["depth"]
    while level >= 0:
        b = t + (beg0 >> s)
        if b in loffsets:
            return loffsets[b]
        level -= 1
        s += 3
        t -= 1 << (level * 3) if level >= 0 else 0
    return 0


def _candidate_chunks(index: dict, ref: dict, beg0: int, end0: int) -> list[tuple[int, int]]:
    """Merged virtual-offset chunks that may hold alignments
    overlapping [beg0, end0): bin lookup → linear/loffset lower bound →
    sort/merge (adjacent or overlapping chunks coalesce so one seek
    serves them)."""
    bins = ref["bins"]
    min_off = _min_voffset(index, ref, beg0)
    chunks = [
        (cb, ce)
        for b in _reg2bins(beg0, end0, index["min_shift"], index["depth"])
        for (cb, ce) in bins.get(b, ())
        if ce > min_off
    ]
    chunks.sort()
    merged: list[list[int]] = []
    for cb, ce in chunks:
        if merged and cb <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], ce)
        else:
            merged.append([cb, ce])
    return [(cb, ce) for cb, ce in merged]


def _inflate_members(f, cbeg: int, cstop: int) -> tuple[bytes, list[tuple[int, int]]]:
    """Inflate consecutive gzip members of an open file from absolute
    byte offset ``cbeg`` through the member that STARTS at ``cstop``
    (inclusive). Returns (inflated_bytes, block_table) where
    block_table rows are (abs_compressed_offset, inflated_offset) —
    the mapping virtual offsets are decoded against. Works on real
    BGZF (64 KiB members) and on any concatenated-gzip layout: member
    boundaries come from the inflater (``unused_data``), not from the
    optional BSIZE extra field."""
    import zlib

    f.seek(cbeg)
    out = bytearray()
    blocks: list[tuple[int, int]] = []
    buf = b""
    abs_at = cbeg
    while abs_at <= cstop:
        if not buf:
            buf = f.read(1 << 20)
            if not buf:
                break  # clean EOF before cstop: chunk end points at EOF
        d = zlib.decompressobj(wbits=31)
        blocks.append((abs_at, len(out)))
        fed = 0
        while True:
            out += d.decompress(buf)
            fed += len(buf)
            if d.eof:
                break
            buf = f.read(1 << 20)
            if not buf:
                raise ValueError(f"truncated gzip member at byte {abs_at}")
        abs_at += fed - len(d.unused_data)
        buf = d.unused_data
    return bytes(out), blocks


def _chunk_records(f, vbeg: int, vend: int, refs: list[str]) -> list[tuple]:
    """Alignment records of one BAI chunk: seek to the BGZF block at
    ``vbeg``'s compressed offset, inflate through ``vend``'s block,
    then walk records from ``vbeg``'s in-block offset until the next
    record would start at or past ``vend``."""
    cbeg, ubeg = vbeg >> 16, vbeg & 0xFFFF
    cend, uend = vend >> 16, vend & 0xFFFF
    data, blocks = _inflate_members(f, cbeg, cend)
    stop = len(data)
    for abs_off, istart in blocks:
        if abs_off == cend:
            stop = istart + uend
            break
    out: list[tuple] = []
    at = ubeg
    while at < stop and at + 4 <= len(data):
        rec, at = _decode_bam_record(data, at, refs)
        out.append(rec)
    return out


def _cigar_ref_span(cigar: str) -> int:
    """Reference bases consumed by a CIGAR string (M/D/N/=/X ops);
    0 for '*' — callers treat such records as 1-base points, the
    samtools convention for placed records without a CIGAR."""
    import re

    return sum(
        int(n) for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar) if op in "MDN=X"
    )


def _bam_refs_from_file(f) -> list[str]:
    """Reference-name table read from the front of an open BAM file,
    inflating only as many BGZF members as the header spans."""
    import struct
    import zlib

    f.seek(0)
    out = bytearray()
    buf = b""
    while True:
        try:
            return _parse_bam_refs(bytes(out))[0]
        except (IndexError, ValueError, UnicodeDecodeError, struct.error) as err:
            if out and bytes(out[:4]) != _BAM_MAGIC:
                raise ValueError("not a BAM file (bad magic)") from err
        if not buf:
            buf = f.read(1 << 20)
            if not buf:
                raise ValueError("truncated BAM header")
        d = zlib.decompressobj(wbits=31)
        while True:
            out += d.decompress(buf)
            if d.eof:
                break
            buf = f.read(1 << 20)
            if not buf:
                raise ValueError("truncated gzip member in BAM header")
        buf = d.unused_data


def parse_region(region: str) -> tuple[str, int, int | None]:
    """'chr1:100-200' (1-based inclusive, the samtools convention) →
    (contig, beg0, end0) 0-based half-open.

    A bare contig ('chr1') means the WHOLE contig: end0 is None and
    the reader resolves the bound per shard from its own index
    geometry (``1 << (min_shift + 3*depth)``, the index's maximum
    addressable coordinate). A fixed ``1 << 29`` here would silently
    drop alignments past 512 Mbp on CSI-indexed long contigs — the
    exact case CSI exists for."""
    contig, sep, span = region.partition(":")
    if not contig or (sep and not span):
        raise ValueError(f"bad region {region!r} (want CONTIG[:BEG-END], 1-based)")
    if not span:
        return contig, 0, None
    lo, _, hi = span.partition("-")
    beg0 = int(lo.replace(",", "")) - 1
    end0 = int(hi.replace(",", "")) if hi else beg0 + 1
    if beg0 < 0 or end0 <= beg0:
        raise ValueError(f"bad region {region!r} (want CONTIG[:BEG-END], 1-based)")
    return contig, beg0, end0


def _open_shard(bam_path: str):
    """Seekable handle on a BAM shard, honoring the sidecar's URI
    scheme: plain open() for local / file: paths, pyarrow.fs for
    everything else (hdfs://, s3a://, ...) so index-driven slices work
    on whatever filesystem served the sidecar — the sidecars already
    arrive through Spark's binaryFile source, which is scheme-agnostic,
    and the shard open must match."""
    if "://" not in bam_path or bam_path.startswith("file:"):
        local = bam_path.removeprefix("file:")
        if not os.path.exists(local):
            raise FileNotFoundError(f"no sibling BAM at {local}")
        return open(local, "rb")
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(bam_path)
    return fs.open_input_file(rel)


def read_bam_region(spark: SparkSession, path: str, region: str) -> DataFrame:
    """Index-driven region slice of BAM shard(s): the records
    overlapping ``region`` ('chr1:100-200', 1-based inclusive), read
    WITHOUT scanning the shards — each task seeks straight to the BGZF
    blocks its sibling ``.bam.bai`` index names (SAM spec §5.2 binning
    + 16kb linear index + virtual-offset chunks, re-derived here from
    the public spec; the reference gets the same capability from
    htsjdk via ADAM).

    Scale shape: the driver never opens a file — the SMALL ``.bai`` /
    ``.csi`` sidecars ride a binaryFile scan (a few MB per 100 GB
    shard), and each task opens only its own shard, inflating only the
    indexed chunk byte ranges. Parallelism is shard count, the same
    unit as ``read_bam``; per-task work is proportional to the
    REGION's data, not the shard's. Shards whose index has no
    overlapping chunk cost one lower-bound lookup and contribute zero
    I/O against the BAM itself. The bin candidate set is a superset,
    so records are re-filtered exactly (CIGAR reference span) — index
    pruning is an optimization, never a semantics change. CSI indexes
    (the variable min_shift/depth generalization for >2^29-bp contigs)
    parse through the same path; a shard carrying BOTH sidecars is
    read once (BAI preferred). CRAM remains the documented boundary."""
    import pandas as pd
    from pyspark.sql import Window

    contig, beg0, end0 = parse_region(region)
    cols = (
        "read_name", "flag", "contig", "pos", "mapq",
        "cigar", "sequence", "quality", "source_file",
    )

    def slice_shards(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for idx_path, content in zip(pdf["path"], pdf["content"]):
                bam_path = idx_path[:-4]  # strip ".bai" / ".csi"
                with _open_shard(bam_path) as f:
                    refs = _bam_refs_from_file(f)
                    if contig not in refs:
                        continue
                    index = _parse_bam_index(bytes(content))
                    ref_id = refs.index(contig)
                    if ref_id >= len(index["refs"]):
                        raise ValueError(
                            f"{idx_path}: {len(index['refs'])} references "
                            f"indexed, BAM header has {len(refs)}"
                        )
                    ref = index["refs"][ref_id]
                    # bare-contig form: the end bound is THIS shard's
                    # index ceiling (2^29 for BAI, larger for CSI) —
                    # never a fixed constant that would truncate long
                    # CSI-indexed contigs
                    hi0 = (
                        end0
                        if end0 is not None
                        else 1 << (index["min_shift"] + 3 * index["depth"])
                    )
                    for vbeg, vend in _candidate_chunks(index, ref, beg0, hi0):
                        for rec in _chunk_records(f, vbeg, vend, refs):
                            pos1 = rec[3]
                            if rec[2] != contig or pos1 is None:
                                continue
                            span = _cigar_ref_span(rec[5]) or 1
                            if pos1 - 1 < hi0 and pos1 - 1 + span > beg0:
                                for c, v in zip(cols, (*rec, bam_path)):
                                    out[c].append(v)
            yield pd.DataFrame(out)

    raw = spark.read.format("binaryFile").load(path + ".{bai,csi}")
    # a shard with both sidecars must be read once: prefer .bai
    # ('.bai' < '.csi' lexicographically); the window runs over the
    # tiny sidecar row set, never the BAM bytes
    one_per_bam = (
        raw.select("path", "content")
        .withColumn("bam", F.expr("substring(path, 1, length(path) - 4)"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("bam").orderBy("path"))
        )
        .filter(F.col("rk") == 1)
        .select("path", "content")
    )
    return one_per_bam.mapInPandas(slice_shards, _BAM_SCHEMA)


# --------------------------------------------------------------- 2bit

_TWOBIT_SIG = 0x1A412743
_TWOBIT_BASES = "TCAG"  # 2-bit code order per the UCSC spec


def read_twobit(spark: SparkSession, path: str) -> DataFrame:
    """(contig, sequence) from a UCSC .2bit reference file — the
    reference's own genome format (cli/Index.scala:60-62 loads a
    TwoBitFile). Parity includes the execution model: the reference's
    TwoBitFile was a DRIVER-LOCAL random-access store broadcast to
    executors (Index.scala:76-78), so parsing driver-side and emitting
    the (contig, sequence) dimension table — which the engine then
    broadcasts for extraction joins (algorithms/index.py) — is the same
    memory contract, not a scale regression: genomes are dimension-
    sized (a 3 Gbp genome is ~750 MB packed / ~3 GB decoded) while the
    100 TB side is always the reads.

    Full spec coverage: both byte orders, N blocks (decoded bases are
    replaced with 'N'), mask blocks (soft-masked regions LOWERCASED,
    matching twoBitToFa's default rendering). Raises on a bad
    signature or version.

    Decode is numpy-vectorized — byte array → four strided 2-bit code
    lanes → one table lookup → ``tobytes``; N/mask blocks are slice
    assignments (``|= 0x20`` is the ASCII lowercase bit). The earlier
    per-base Python loop cost ~3×10⁹ iterations for a human genome
    (hours of driver time); the vectorized form decodes a 100 Mbp
    chromosome-scale contig in ~1.6s including the final str
    conversion (timed in tests/test_bio_formats.py), so a whole 3 Gbp
    genome loads in under a minute — matching the reference's
    random-access open in spirit while still producing the full
    dimension table."""
    import struct

    import numpy as np

    with open(path, "rb") as f:
        data = f.read()

    (sig_le,) = struct.unpack_from("<I", data, 0)
    if sig_le == _TWOBIT_SIG:
        order = "<"
    else:
        (sig_be,) = struct.unpack_from(">I", data, 0)
        if sig_be != _TWOBIT_SIG:
            raise ValueError(f"not a 2bit file (bad signature): {path}")
        order = ">"
    version, seq_count, _reserved = struct.unpack_from(f"{order}III", data, 4)
    if version != 0:
        raise ValueError(f"unsupported 2bit version {version}: {path}")

    # file index: (name, record offset) per sequence
    index = []
    pos = 16
    for _ in range(seq_count):
        name_size = data[pos]
        pos += 1
        name = data[pos : pos + name_size].decode("ascii")
        pos += name_size
        (offset,) = struct.unpack_from(f"{order}I", data, pos)
        pos += 4
        index.append((name, offset))

    def _blocks(at: int) -> tuple[list[tuple[int, int]], int]:
        (count,) = struct.unpack_from(f"{order}I", data, at)
        at += 4
        starts = struct.unpack_from(f"{order}{count}I", data, at)
        at += 4 * count
        sizes = struct.unpack_from(f"{order}{count}I", data, at)
        at += 4 * count
        return list(zip(starts, sizes)), at

    base_lut = np.frombuffer(_TWOBIT_BASES.encode("ascii"), dtype=np.uint8)
    rows = []
    for name, offset in index:
        (dna_size,) = struct.unpack_from(f"{order}I", data, offset)
        at = offset + 4
        n_blocks, at = _blocks(at)
        mask_blocks, at = _blocks(at)
        at += 4  # reserved
        n_bytes = (dna_size + 3) // 4
        packed = np.frombuffer(data, dtype=np.uint8, count=n_bytes, offset=at)
        # decode 2 bits/base, first base in the byte's HIGH bits: four
        # strided lanes per byte, then truncate the tail padding
        codes = np.empty(n_bytes * 4, dtype=np.uint8)
        codes[0::4] = (packed >> 6) & 3
        codes[1::4] = (packed >> 4) & 3
        codes[2::4] = (packed >> 2) & 3
        codes[3::4] = packed & 3
        seq = base_lut[codes[:dna_size]]
        for start, size in n_blocks:
            seq[start : start + size] = ord("N")
        for start, size in mask_blocks:
            seq[start : start + size] |= 0x20  # ASCII lowercase bit
        rows.append((name, seq.tobytes().decode("ascii")))

    from rnadam_spark import schemas

    return spark.createDataFrame(rows, schemas.GENOME)
