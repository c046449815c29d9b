"""Gate rows for the NATIVE ingestion surface (gate rotation r12).

The format loaders in ``sources/bio_formats.py`` serve the reference's
primary entry point (rice-cli/.../cli/Quantify.scala:73 loads
SAM/BAM/FASTQ via ADAM; cli/Index.scala:60-69 loads GTF + 2bit) and
were pytest-pinned only — never driver-verified. These rows close that:
each derives a file DETERMINISTICALLY from the ``documents`` parquet
(plain f-string-grade formatting, independent of the loader under
test), writes it with Spark's distributed text sink, reads it back
through the NATIVE loader, and returns the parsed records — while the
DuckDB oracle recomputes the expected loader output straight from the
parquet, never seeing the file. A framing, sentinel-mapping, or
coordinate-convention bug in the loader therefore hash-mismatches.

Determinism: every derived field is pure integer/string arithmetic on
``doc_id``/``text`` (no RNG, no timestamps), so both engines agree
bit-for-bit at any scale factor. Row order never matters (the gate
compare is order-insensitive).

Scale shape: one distributed text write + one distributed native read
per row — two corpus passes, no shuffle anywhere (the GTF row's rollup
groupBy is the one exchange, grouped on the line-local transcript_id).

Shared-filesystem assumption (r12 ADVICE): the staging dir lives on the
LOCAL filesystem, which works because this harness runs local[N] — the
driver that writes and the executors that read share /tmp. On a real
multi-node cluster these rows would need a shared scratch URI (HDFS/S3)
instead; the loaders themselves are path-scheme-agnostic.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rnadam_spark.registry import query
from rnadam_spark.sources import bio_formats
from rnadam_spark.sources.tables import load_table


def _cleanup_staging() -> None:
    """Remove this process's staging root at interpreter exit — the
    per-pid key that isolates concurrent harnesses would otherwise
    guarantee one leaked corpus-sized directory PER process (r12
    ADVICE)."""
    shutil.rmtree(f"/tmp/rnadam_ingest_{os.getpid()}", ignore_errors=True)


atexit.register(_cleanup_staging)


def _staging_dir(fmt: str, sf_dir: str) -> str:
    """Deterministic per-(format, corpus, process) scratch dir. The pid
    keeps concurrent harnesses (driver gate vs a local bench) from
    overwriting each other's files mid-read; reruns in one process
    overwrite in place, and the whole pid root is rmtree'd at process
    exit (atexit above)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"/tmp/rnadam_ingest_{os.getpid()}/{fmt}_{tag}"


def _seq_col() -> Column:
    """The document's ACGT 'sequence': keep only a/c/g/t letters,
    uppercased — mirrored verbatim in the oracles' regexp_replace."""
    return F.upper(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[^acgt]", ""))


_SEQ_SQL = "upper(regexp_replace(coalesce(text, ''), '[^acgt]', '', 'g'))"


# --------------------------------------------------------------- FASTQ

_FASTQ_SQL = f"""
WITH s AS (SELECT doc_id, {_SEQ_SQL} AS seq FROM documents)
SELECT 'r' || CAST(doc_id AS VARCHAR) AS read_name,
       seq AS sequence,
       repeat(chr(CAST(60 + doc_id % 10 AS INT)), length(seq)) AS quality
FROM s WHERE length(seq) > 0
"""


@query("fastq_ingest", oracle=_FASTQ_SQL)
def fastq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 ingestion, FASTQ: write 4-line records derived from documents
    (read r<doc_id>, ACGT-filtered sequence, per-doc quality char from
    chr(60 + doc_id % 10) — the range deliberately spans '@' (64), the
    record sigil, so quality lines that START with '@' exercise exactly
    the framing case that forbids a delimiter split), then parse them
    back through the native ``read_fastq`` (wholetext + in-row 4-line
    chunking; cli/Quantify.scala:73's FASTQ arm). The oracle recomputes
    the expected records from parquet — it never sees the file."""
    docs = load_table(spark, sf_dir, "documents")
    seq = _seq_col()
    qual = F.repeat(F.char(F.lit(60) + F.pmod("doc_id", F.lit(10))), F.length(seq))
    lines = docs.select(
        F.concat(
            F.lit("@r"), F.col("doc_id").cast("string"), F.lit("\n"),
            seq, F.lit("\n+\n"), qual,
        ).alias("value"),
        seq.alias("_seq"),
    ).filter(F.length("_seq") > 0).select("value")
    out = _staging_dir("fastq", sf_dir)
    lines.write.mode("overwrite").text(out)
    return bio_formats.read_fastq(spark, out).select("read_name", "sequence", "quality")


# ----------------------------------------------------------------- SAM

# '' sequences are FORCED for doc_id % 17 == 0 so the '*' SEQ sentinel
# is exercised even on corpora where every document yields ACGT chars
_SAM_SQL = f"""
WITH s AS (SELECT doc_id,
                  CASE WHEN doc_id % 17 = 0 THEN '' ELSE {_SEQ_SQL} END AS seq
           FROM documents)
SELECT 'r' || CAST(doc_id AS VARCHAR) AS read_name,
       CAST(doc_id % 4096 AS INT) AS flag,
       CASE WHEN doc_id % 11 = 0 THEN NULL
            ELSE 'c' || CAST(doc_id % 7 AS VARCHAR) END AS contig,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(doc_id % 100000 + 1 AS BIGINT) END AS pos,
       CAST(doc_id % 61 AS INT) AS mapq,
       CASE WHEN length(seq) = 0 THEN '*'
            ELSE CAST(length(seq) AS VARCHAR) || 'M' END AS cigar,
       seq AS sequence,
       CASE WHEN doc_id % 5 = 0 OR length(seq) = 0 THEN NULL
            ELSE repeat(chr(CAST(33 + doc_id % 9 AS INT)), length(seq)) END AS quality
FROM s
"""


@query("sam_ingest", oracle=_SAM_SQL)
def sam_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 ingestion, SAM: write 11-field alignment lines derived from
    documents — including every missing-value sentinel the loader must
    map (RNAME '*' → null contig on doc_id%11, POS 0 → null on
    doc_id%13, QUAL '*' → null on doc_id%5, SEQ '*' → '' on doc_id%17)
    and two header lines that must drop — then parse them back through
    the native ``read_sam`` (splittable text scan, one in-row
    projection; the text twin of read_bam, cli/Quantify.scala:73's
    SAM arm). Quality chars stay in chr(33..41), below '*' (42), so a
    length-1 quality string can never collide with the missing-QUAL
    sentinel. The oracle recomputes the expected records from parquet."""
    docs = load_table(spark, sf_dir, "documents")
    seq = F.when(F.pmod("doc_id", F.lit(17)) == 0, F.lit("")).otherwise(_seq_col())
    empty = F.length(seq) == 0
    did = F.col("doc_id").cast("string")
    qual = F.when(
        (F.pmod("doc_id", F.lit(5)) == 0) | empty, F.lit("*")
    ).otherwise(F.repeat(F.char(F.lit(33) + F.pmod("doc_id", F.lit(9))), F.length(seq)))
    body = docs.select(
        F.concat_ws(
            "\t",
            F.concat(F.lit("r"), did),  # QNAME
            F.pmod("doc_id", F.lit(4096)).cast("string"),  # FLAG
            F.when(F.pmod("doc_id", F.lit(11)) == 0, F.lit("*")).otherwise(
                F.concat(F.lit("c"), F.pmod("doc_id", F.lit(7)).cast("string"))
            ),  # RNAME
            F.when(F.pmod("doc_id", F.lit(13)) == 0, F.lit("0")).otherwise(
                (F.pmod("doc_id", F.lit(100000)) + 1).cast("string")
            ),  # POS
            F.pmod("doc_id", F.lit(61)).cast("string"),  # MAPQ
            F.when(empty, F.lit("*")).otherwise(
                F.concat(F.length(seq).cast("string"), F.lit("M"))
            ),  # CIGAR
            F.lit("*"), F.lit("0"), F.lit("0"),  # RNEXT PNEXT TLEN
            F.when(empty, F.lit("*")).otherwise(seq),  # SEQ
            qual,  # QUAL
        ).alias("value")
    )
    header = spark.createDataFrame(
        [("@HD\tVN:1.6",), ("@SQ\tSN:c0\tLN:100000",)], "value string"
    )
    out = _staging_dir("sam", sf_dir)
    header.unionAll(body).write.mode("overwrite").text(out)
    return bio_formats.read_sam(spark, out).drop("source_file")


# ----------------------------------------------------------------- GTF

_GTF_SQL = """
WITH e AS (
  SELECT doc_id, CAST(unnest(range(1, doc_id % 3 + 2)) AS BIGINT) AS e
  FROM documents
)
SELECT 't' || CAST(doc_id AS VARCHAR) AS t_id,
       'g' || CAST(doc_id % 50 AS VARCHAR) AS gene_id,
       doc_id % 2 = 0 AS strand,
       CAST(e AS INT) AS exon_rank,
       CASE WHEN doc_id % 4 = 0
            THEN 't' || CAST(doc_id AS VARCHAR) || '.e' || CAST(e AS VARCHAR)
            ELSE 'x' || CAST(doc_id AS VARCHAR) || '.' || CAST(e AS VARCHAR) END AS exon_id,
       'chr' || CAST(doc_id % 5 AS VARCHAR) AS contig,
       CAST(1000 * e + doc_id % 97 AS BIGINT) AS start,
       CAST(1000 * e + doc_id % 97 + 10 * e + doc_id % 13 + 3 AS BIGINT) AS "end"
FROM e
"""


@query("gtf_ingest", oracle=_GTF_SQL)
def gtf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 ingestion, GTF: write exon feature lines derived from
    documents (1–3 exons per doc, transcript t<doc_id>), plus per-doc
    'transcript' feature lines and a '#' comment line that must both
    drop, then parse back through the native ``read_gtf`` →
    ``transcripts_from_gtf`` rollup (cli/Index.scala:65-69's gene
    ingest) and flatten the nested exons for the hash compare. The row
    verifies the attribute regex, the 1-based-inclusive → engine
    coordinate conversion (start−1, end+1 — the width−1 quirk's other
    half, SURVEY P9), the per-transcript start-sort, AND the positional
    exon_id fill: docs with doc_id%4==0 write NO exon_id attribute, so
    the loader must mint 't<doc_id>.e<rank>' — the oracle predicts
    exactly that (ranks equal e because start grows with e)."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    strand = F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("+")).otherwise(F.lit("-"))
    exons = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.pmod("doc_id", F.lit(3)) + 1)).alias("e")
    )
    e = F.col("e").cast("long")
    gstart = 1000 * e + F.pmod("doc_id", F.lit(97)) + 1  # written 1-based inclusive
    gend = gstart + 10 * e + F.pmod("doc_id", F.lit(13)) + 1
    attrs = F.concat(
        F.lit('gene_id "g'), F.pmod("doc_id", F.lit(50)).cast("string"),
        F.lit('"; transcript_id "t'), did, F.lit('";'),
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("")).otherwise(
            F.concat(F.lit(' exon_id "x'), did, F.lit("."), e.cast("string"), F.lit('";'))
        ),
    )
    contig = F.concat(F.lit("chr"), F.pmod("doc_id", F.lit(5)).cast("string"))
    exon_lines = exons.select(
        F.concat_ws(
            "\t", contig, F.lit("synth"), F.lit("exon"),
            gstart.cast("string"), gend.cast("string"),
            F.lit("."), strand, F.lit("."), attrs,
        ).alias("value")
    )
    # non-exon feature rows + a comment line: both must be ignored
    tx_lines = docs.select(
        F.concat_ws(
            "\t", contig, F.lit("synth"), F.lit("transcript"),
            F.lit("1"), F.lit("99999"), F.lit("."), strand, F.lit("."),
            F.concat(F.lit('gene_id "g'), F.pmod("doc_id", F.lit(50)).cast("string"),
                     F.lit('"; transcript_id "t'), did, F.lit('";')),
        ).alias("value")
    )
    comment = spark.createDataFrame([("# synthetic GTF (ingest gate row)",)], "value string")
    out = _staging_dir("gtf", sf_dir)
    comment.unionAll(exon_lines).unionAll(tx_lines).write.mode("overwrite").text(out)
    rolled = bio_formats.transcripts_from_gtf(bio_formats.read_gtf(spark, out))
    return rolled.select(
        "t_id", "gene_id", "strand", F.posexplode("exons").alias("pos0", "x")
    ).select(
        "t_id",
        "gene_id",
        "strand",
        (F.col("pos0") + 1).cast("int").alias("exon_rank"),
        F.col("x.exon_id").alias("exon_id"),
        F.col("x.contig").alias("contig"),
        F.col("x.start").alias("start"),
        F.col("x.end").alias("end"),
    )


# ----------------------------------------------------------------- BAM

# The binary-surface row (gate rotation r13). Adversarial coverage, all
# predicted by the oracle from parquet alone:
#   doc_id % 17 == 0 -> l_seq 0      (cigar '*', sequence '', qual null)
#   doc_id % 19 == 0 -> first base N (nibble code 15 — beyond ACGT)
#   doc_id % 11 == 0 -> ref_id -1    (unmapped -> contig null)
#   doc_id % 13 == 0 -> pos0 -1      (-> pos null; else 0-based -> 1-based)
#   doc_id %  5 == 0 -> 0xff qual    (missing-quality fill -> null)
#   doc_id %  3 == 0 -> two-op cigar ((l-1)M 1S — multi-op + op table)
#   doc_id % 4096    -> flag          (spans 0x100/0x800 secondary/suppl
#                                      and the 0x40/0x80 pair bits)
_BAM_SQL = f"""
WITH s AS (SELECT doc_id,
                  CASE WHEN doc_id % 17 = 0 THEN '' ELSE {_SEQ_SQL} END AS seq0
           FROM documents),
     s2 AS (SELECT doc_id,
                   CASE WHEN doc_id % 19 = 0 AND length(seq0) > 0
                        THEN 'N' || substr(seq0, 2) ELSE seq0 END AS seq
            FROM s)
SELECT 'r' || CAST(doc_id AS VARCHAR) AS read_name,
       CAST(doc_id % 4096 AS INT) AS flag,
       CASE WHEN doc_id % 11 = 0 THEN NULL
            ELSE 'c' || CAST(doc_id % 7 AS VARCHAR) END AS contig,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(doc_id % 100000 + 1 AS BIGINT) END AS pos,
       CAST(doc_id % 61 AS INT) AS mapq,
       CASE WHEN length(seq) = 0 THEN '*'
            WHEN doc_id % 3 = 0 AND length(seq) >= 2
            THEN CAST(length(seq) - 1 AS VARCHAR) || 'M1S'
            ELSE CAST(length(seq) AS VARCHAR) || 'M' END AS cigar,
       seq AS sequence,
       CASE WHEN doc_id % 5 = 0 OR length(seq) = 0 THEN NULL
            ELSE repeat(chr(CAST(33 + doc_id % 9 AS INT)), length(seq)) END AS quality
FROM s2
"""

# writer-side nibble codes: the SAM spec's '=ACMGRSVTWYHKDBN' positions
# for the four bases + N, written here as literals (NOT imported from
# the loader under test)
_BAM_PACK_CODES = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}


def _pack_bam_record(doc_id: int, seq: str) -> bytes:
    """One BAM alignment record (block_size-prefixed) from plain
    integer/string arithmetic on (doc_id, seq) — the binary analogue of
    the SAM row's f-string formatting. Layout per SAM spec §4.2."""
    import struct

    if doc_id % 19 == 0 and seq:
        seq = "N" + seq[1:]
    name = f"r{doc_id}".encode("ascii") + b"\x00"
    ref_id = -1 if doc_id % 11 == 0 else doc_id % 7
    pos0 = -1 if doc_id % 13 == 0 else doc_id % 100000
    l_seq = len(seq)
    if l_seq == 0:
        cigar_ops: list[int] = []
    elif doc_id % 3 == 0 and l_seq >= 2:
        cigar_ops = [((l_seq - 1) << 4) | 0, (1 << 4) | 4]  # (l-1)M 1S
    else:
        cigar_ops = [(l_seq << 4) | 0]  # lM
    packed = bytearray((l_seq + 1) // 2)
    for j, ch in enumerate(seq):
        code = _BAM_PACK_CODES[ch]
        packed[j // 2] |= code << 4 if j % 2 == 0 else code
    qual = (b"\xff" if doc_id % 5 == 0 else bytes([doc_id % 9])) * l_seq
    body = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id, pos0, len(name), doc_id % 61, 0, len(cigar_ops),
            doc_id % 4096, l_seq, -1, -1, 0,
        )
        + name
        + struct.pack(f"<{len(cigar_ops)}I", *cigar_ops)
        + bytes(packed)
        + qual
    )
    return struct.pack("<i", len(body)) + body


def _bam_header_bytes() -> bytes:
    """Magic + SAM-text header + the 7-name c0..c6 reference table."""
    import struct

    text = b"@HD\tVN:1.6\n"
    out = b"BAM\x01" + struct.pack("<i", len(text)) + text + struct.pack("<i", 7)
    for i in range(7):
        nm = f"c{i}".encode("ascii") + b"\x00"
        out += struct.pack("<i", len(nm)) + nm + struct.pack("<i", 100000)
    return out


def bam_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 ingestion, BAM — the binary arm of cli/Quantify.scala:73's
    SAM/BAM entry point (the r12 VERDICT's missing #1).

    NOT registered: the r13 mid-build rotation had put this row on the
    gate by retiring ``lsh_candidate_pairs``, but optimization rounds
    must keep every previously-declared query AND the gate checks only
    the first 50 registered rows, so the rotation was undone — the r12
    row is back and this one is pinned by
    tests/test_bio_formats.py::test_bam_ingest_matches_gate_oracle,
    which hash-compares the loader output against the SAME DuckDB
    oracle SQL (``_BAM_SQL``) the gate row would have run. Each executor packs its partition's
    records per SAM spec §4.2 (struct.pack literals above — block_size
    framing, NUL-terminated names, 4-bit seq nibbles high-first,
    binary cigar ops, raw phred bytes) into one BAM shard; shards with
    even first doc_id stay PLAIN uncompressed BAM, the rest are written
    as TWO concatenated gzip members split mid-payload (BGZF is a
    multi-member gzip stream — this pins the loader's whole-stream
    inflate, not just single-member gzip). read_bam then parses the
    shards back and the oracle predicts every record from parquet.

    Honest caveat (r12 VERDICT endorsement): unlike the text rows,
    writer and reader both implement the one binary spec, so a
    mirrored MISREADING of the spec would cancel out. What cannot
    cancel: field derivations (the oracle computes them independently
    in SQL), sentinel mappings (-1 refs, 0xff qual, 0-based->1-based),
    nibble/cigar tables (written as literals here, not imported), and
    framing (a block_size bug desynchronizes the walk and scrambles
    every downstream field).

    Scale shape: one corpus pass to pack+write (embarrassingly
    parallel, one shard per partition), one distributed binaryFile
    read to parse — no shuffle. The shard SET is partition-dependent
    but the record multiset is not, and the gate compare is
    order-insensitive. Tasks write shards non-transactionally (uuid
    names into a driver-cleared dir) — fine under local[N]; a real
    cluster deployment would stage through a committing sink."""
    docs = load_table(spark, sf_dir, "documents")
    seq = F.when(F.pmod("doc_id", F.lit(17)) == 0, F.lit("")).otherwise(_seq_col())
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"), seq.alias("seq"))
    out = _staging_dir("bam", sf_dir)
    # clear + recreate so an in-process rerun cannot accumulate shards
    # (the text rows get this from Spark's overwrite mode; binary
    # shards are uuid-named, so the dir itself is the overwrite unit)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_shards(batches):
        import gzip
        import uuid

        import pandas as pd

        recs: list[bytes] = []
        first: int | None = None
        for pdf in batches:
            for doc_id, s in zip(pdf["doc_id"], pdf["seq"]):
                if first is None:
                    first = int(doc_id)
                recs.append(_pack_bam_record(int(doc_id), s))
        if recs:
            payload = _bam_header_bytes() + b"".join(recs)
            if first % 2 == 0:
                blob = payload  # plain uncompressed BAM arm
            else:
                half = len(payload) // 2  # mid-payload: members are NOT
                # record-aligned, exactly like real BGZF blocks
                blob = gzip.compress(payload[:half], mtime=0) + gzip.compress(
                    payload[half:], mtime=0
                )
            with open(os.path.join(out, f"shard-{uuid.uuid4().hex}.bam"), "wb") as f:
                f.write(blob)
        yield pd.DataFrame({"n": [len(recs)]})

    src.mapInPandas(write_shards, "n long").agg(F.sum("n")).collect()
    return bio_formats.read_bam(spark, out).drop("source_file")


# -------------------------------------------------- BAM + BAI region

#: 1-based inclusive samtools form. The window sits LOW because
#: pos0 = doc_id % 100000 degenerates to pos0 = doc_id on small
#: corpora — a high window would be empty at gate scale and the row
#: would pin nothing (caught on first run: 0 rows at sf0.01).
_BAM_REGION = "c3:101-300"
_BAM_REGION_BEG0, _BAM_REGION_END0 = 100, 300

#: Inflated-payload cap per gzip member. Real BGZF caps members at
#: 64 KiB (the 16-bit in-member virtual-offset field); 2 KiB here
#: forces MULTI-member shards even at gate scale (sf0.01 ~ a dozen
#: records per shard), so the index seek path crosses member
#: boundaries from the smallest corpus up.
_BAM_MEMBER_CAP = 2048

# The region row's oracle: the mapped subset of the bam_ingest record
# derivation, filtered by the reader's exact overlap predicate —
# pos0 < end0 AND pos0 + span > beg0, where span is the CIGAR's
# reference consumption ((l-1)M1S consumes l-1: S is not M/D/N/=/X)
# and a '*'-cigar record counts as a 1-base POINT (the samtools
# convention the reader applies via `_cigar_ref_span(...) or 1`).
_BAM_REGION_SQL = f"""
WITH s AS (SELECT doc_id,
                  CASE WHEN doc_id % 17 = 0 THEN '' ELSE {_SEQ_SQL} END AS seq0
           FROM documents
           WHERE doc_id % 11 <> 0 AND doc_id % 13 <> 0 AND doc_id % 7 = 3),
     s2 AS (SELECT doc_id,
                   CASE WHEN doc_id % 19 = 0 AND length(seq0) > 0
                        THEN 'N' || substr(seq0, 2) ELSE seq0 END AS seq
            FROM s),
     m AS (SELECT doc_id, seq, doc_id % 100000 AS pos0,
                  CASE WHEN length(seq) = 0 THEN 1
                       WHEN doc_id % 3 = 0 AND length(seq) >= 2
                       THEN length(seq) - 1
                       ELSE length(seq) END AS span
           FROM s2)
SELECT 'r' || CAST(doc_id AS VARCHAR) AS read_name,
       CAST(doc_id % 4096 AS INT) AS flag,
       'c3' AS contig,
       CAST(pos0 + 1 AS BIGINT) AS pos,
       CAST(doc_id % 61 AS INT) AS mapq,
       CASE WHEN length(seq) = 0 THEN '*'
            WHEN doc_id % 3 = 0 AND length(seq) >= 2
            THEN CAST(length(seq) - 1 AS VARCHAR) || 'M1S'
            ELSE CAST(length(seq) AS VARCHAR) || 'M' END AS cigar,
       seq AS sequence,
       CASE WHEN doc_id % 5 = 0 OR length(seq) = 0 THEN NULL
            ELSE repeat(chr(CAST(33 + doc_id % 9 AS INT)), length(seq)) END AS quality
FROM m
WHERE pos0 < {_BAM_REGION_END0} AND pos0 + span > {_BAM_REGION_BEG0}
"""


def _reg2bin_lit(beg: int, end: int) -> int:
    """SAM spec §5.3 bin number for [beg, end) — the C macro from the
    spec written out as literals (min_shift 14, depth 5), deliberately
    NOT imported from the loader's generalized reg2bin."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _bai_bytes(placed: list[tuple[int, int, int, int, int]], n_ref: int = 7) -> bytes:
    """Spec §5.2 BAI for one shard: per ref, the bin->chunk table (one
    exact chunk per record) and the 16 KiB linear index (min virtual
    offset per window, next-record fallback past the tail — the value
    the reader's chunk pruning lower-bounds against).

    ``placed``: (ref_id, beg0, end0, vbeg, vend) per mapped record."""
    import struct

    out = bytearray(b"BAI\x01" + struct.pack("<i", n_ref))
    for rid in range(n_ref):
        mine = [p for p in placed if p[0] == rid]
        bins: dict[int, list[tuple[int, int]]] = {}
        for _, beg0, end0, vbeg, vend in mine:
            bins.setdefault(_reg2bin_lit(beg0, end0), []).append((vbeg, vend))
        out += struct.pack("<i", len(bins))
        for b, chunks in sorted(bins.items()):
            out += struct.pack("<Ii", b, len(chunks))
            for cb, ce in chunks:
                out += struct.pack("<QQ", cb, ce)
        n_intv = (max((p[2] - 1 for p in mine), default=0) >> 14) + 1 if mine else 0
        out += struct.pack("<i", n_intv)
        for w in range(n_intv):
            lo, hi = w << 14, (w + 1) << 14
            over = [p[3] for p in mine if p[1] < hi and p[2] > lo]
            after = [p[3] for p in mine if p[1] >= hi]
            out += struct.pack("<Q", min(over or after or [0]))
    return bytes(out)


def bam_region_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 ingestion, BAI-indexed region slice — cli/Quantify.scala:73's
    region-query capability (htsjdk/ADAM there; the binary surface's
    seek path).

    NOT registered (same rotation-undo rationale as ``bam_ingest``):
    the row stays pinned by tests/test_bio_formats.py::
    test_bam_region_ingest_matches_gate_oracle against the same DuckDB
    oracle SQL (``_BAM_REGION_SQL``). Each
    executor packs its partition's MAPPED records (the bam_ingest
    derivation minus the unmapped/-1-pos rows, same shared
    _pack_bam_record), splits the payload into gzip members capped at
    2 KiB inflated bytes (_BAM_MEMBER_CAP) (multi-member layout even at gate
    scale), and writes a spec §5.2 .bam.bai sidecar — binning via the
    spec's literal C macro, one exact virtual-offset chunk per record,
    16 KiB linear index with the next-record fallback. read_bam_region
    then seeks straight to the indexed chunks for _BAM_REGION and the
    DuckDB oracle predicts the result from parquet with the reader's
    exact overlap predicate — including the '*'-cigar POINT convention
    (empty-seq records span 1 base) and the (l-1)M1S soft-clip span
    (S consumes no reference).

    What the row pins that bam_ingest cannot: virtual-offset encoding
    (compressed member start << 16 | in-member offset), bin/chunk
    framing, linear-index pruning correctness (a wrong lower bound
    DROPS records -> hash mismatch), cross-member seeks, and the
    overlap re-filter. Same co-designed-writer caveat as bam_ingest,
    same mitigations (field derivations oracle-independent, tables as
    literals, framing desync scrambles everything downstream).

    Scale shape: one corpus pass to pack+index+write, then an
    index-driven read whose per-task work is proportional to the
    REGION's data, not the shard's — the sidecars ride a binaryFile
    scan and each task opens only its own shard (read_bam_region's
    contract; at 100 TB this is the difference between a region query
    and a full scan)."""
    docs = load_table(spark, sf_dir, "documents")
    mapped = docs.filter(
        (F.pmod("doc_id", F.lit(11)) != 0) & (F.pmod("doc_id", F.lit(13)) != 0)
    )
    seq = F.when(F.pmod("doc_id", F.lit(17)) == 0, F.lit("")).otherwise(_seq_col())
    src = mapped.select(F.col("doc_id").cast("long").alias("doc_id"), seq.alias("seq"))
    out = _staging_dir("bam_region", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_shards(batches):
        import gzip
        import uuid

        import pandas as pd

        recs: list[tuple[int, int, int, bytes]] = []
        for pdf in batches:
            for doc_id, s in zip(pdf["doc_id"], pdf["seq"]):
                doc_id = int(doc_id)
                length = len(s)
                if length == 0:
                    span = 1  # '*' cigar: 1-base point
                elif doc_id % 3 == 0 and length >= 2:
                    span = length - 1  # (l-1)M 1S: S consumes no ref
                else:
                    span = length
                pos0 = doc_id % 100000
                recs.append(
                    (doc_id % 7, pos0, pos0 + span, _pack_bam_record(doc_id, s))
                )
        if recs:
            blobs = [gzip.compress(_bam_header_bytes(), mtime=0)]
            coffset = len(blobs[0])
            placed: list[tuple[int, int, int, int, int]] = []
            payload = b""
            cur: list[tuple[int, int, int, int, int]] = []

            def flush():
                nonlocal payload, cur, coffset
                if not payload:
                    return
                for ref_id, beg0, end0, off, off2 in cur:
                    placed.append(
                        (ref_id, beg0, end0, (coffset << 16) | off, (coffset << 16) | off2)
                    )
                blob = gzip.compress(payload, mtime=0)
                blobs.append(blob)
                coffset += len(blob)
                payload = b""
                cur = []

            for ref_id, beg0, end0, rb in recs:
                if payload and len(payload) + len(rb) > _BAM_MEMBER_CAP:
                    flush()
                off = len(payload)
                payload += rb
                cur.append((ref_id, beg0, end0, off, len(payload)))
            flush()
            name = os.path.join(out, f"shard-{uuid.uuid4().hex}.bam")
            with open(name, "wb") as f:
                f.write(b"".join(blobs))
            with open(name + ".bai", "wb") as f:
                f.write(_bai_bytes(placed))
        yield pd.DataFrame({"n": [len(recs)]})

    src.mapInPandas(write_shards, "n long").agg(F.sum("n")).collect()
    return bio_formats.read_bam_region(spark, out + "/*.bam", _BAM_REGION).drop(
        "source_file"
    )
