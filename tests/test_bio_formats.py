"""Native FASTA/FASTQ/GTF ingestion (sources/bio_formats.py): parse
goldens, malformed-input guards, coordinate-convention agreement with
the engine's exon fixtures, and a CLI index+quantify e2e driven
entirely from native-format files."""

from __future__ import annotations

import glob
import gzip

import pytest

from rnadam_spark.sources import bio_formats as bio

FASTA = """>chr1 Homo sapiens test contig
ACGTACGTAC
GTACGT
>chr2
TTTTGGGGCCCCAAAA

>empty_record
"""

FASTQ = """@read/1 len=8
ACGTACGT
+
IIIIIIII
@read/2
GGGGCCCC
+read/2
@@@@@@@@
"""

GTF = """# comment line
chr1\thavana\tgene\t1\t100\t.\t+\t.\tgene_id "g1";
chr1\thavana\texon\t11\t20\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; exon_id "t1e1";
chr1\thavana\texon\t31\t40\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; exon_id "t1e2";
chr1\thavana\texon\t5\t14\t.\t-\t.\tgene_id "g1"; transcript_id "t2";
"""


def test_read_fasta_golden(spark, tmp_path):
    p = tmp_path / "ref.fa"
    p.write_text(FASTA)
    rows = {r.contig: r for r in bio.read_fasta(spark, str(p)).collect()}
    assert set(rows) == {"chr1", "chr2"}  # empty record dropped
    assert rows["chr1"].sequence == "ACGTACGTACGTACGT"  # lines joined
    assert rows["chr1"].description == "Homo sapiens test contig"
    assert rows["chr2"].sequence == "TTTTGGGGCCCCAAAA"
    assert rows["chr2"].description is None


def test_read_fasta_gzip_and_crlf(spark, tmp_path):
    p = tmp_path / "ref.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(FASTA.replace("\n", "\r\n"))
    rows = {r.contig: r.sequence for r in bio.read_fasta(spark, str(p)).collect()}
    assert rows == {"chr1": "ACGTACGTACGTACGT", "chr2": "TTTTGGGGCCCCAAAA"}


def test_read_fastq_golden(spark, tmp_path):
    p = tmp_path / "reads.fastq"
    p.write_text(FASTQ)
    rows = {r.read_name: r for r in bio.read_fastq(spark, str(p)).collect()}
    # '@' inside the quality line of read/2 must not break framing
    assert set(rows) == {"read/1 len=8", "read/2"}
    assert rows["read/1 len=8"].sequence == "ACGTACGT"
    assert rows["read/2"].quality == "@@@@@@@@"
    ids = bio.reads_from_fastq(bio.read_fastq(spark, str(p)))
    got = ids.collect()
    assert len(got) == 2 and all(isinstance(r.read_id, int) for r in got)


def test_read_fastq_malformed_raises(spark, tmp_path):
    p = tmp_path / "bad.fq"
    p.write_text("@r1\nACGT\n+\n")  # missing quality line
    with pytest.raises(Exception, match="malformed FASTQ"):
        bio.read_fastq(spark, str(p)).collect()


def test_read_gtf_and_transcript_rollup(spark, tmp_path):
    p = tmp_path / "genes.gtf"
    p.write_text(GTF)
    flat = bio.read_gtf(spark, str(p))
    assert flat.count() == 4  # comment skipped
    t = {r.t_id: r for r in bio.transcripts_from_gtf(flat).collect()}
    assert set(t) == {"t1", "t2"}
    # 1-based inclusive -> engine convention: start-1 / end+1, sorted
    e = t["t1"].exons
    assert [(x.exon_id, x.start, x.end) for x in e] == [
        ("t1e1", 10, 21),
        ("t1e2", 30, 41),
    ]
    assert t["t1"].strand is True and t["t1"].gene_id == "g1"
    # missing exon_id filled positionally after the sort
    assert [(x.exon_id, x.start, x.end) for x in t["t2"].exons] == [("t2.e1", 4, 15)]
    assert t["t2"].strand is False
    # the quirky width-1 transcript length equals the true exon length
    for r, true_len in ((t["t1"], 20), (t["t2"], 10)):
        quirky = sum(x.end - x.start - 1 for x in r.exons)
        assert quirky == true_len


def test_cli_index_quantify_from_native_formats(spark, tmp_path):
    """The reference's own I/O story end-to-end: FASTA genome + GTF
    genes -> index; FASTQ reads -> quantify; uniform abundances for
    uniformly drawn reads."""
    import random

    from rnadam_spark import cli

    rng = random.Random(5)
    t_len = 300
    seqs = ["".join(rng.choice("ACGT") for _ in range(t_len)) for _ in range(3)]
    genome_seq = "".join(seqs)
    fa = tmp_path / "genome.fa"
    fa.write_text(">chr1\n" + "\n".join(
        genome_seq[i : i + 60] for i in range(0, len(genome_seq), 60)
    ) + "\n")
    gtf_lines = []
    for i in range(3):
        # engine convention start0 = i*t_len, end = start0 + t_len + 1
        # -> GTF 1-based inclusive: start0+1 .. start0+t_len
        gtf_lines.append(
            f'chr1\ttest\texon\t{i * t_len + 1}\t{(i + 1) * t_len}\t.\t+\t.\t'
            f'gene_id "g1"; transcript_id "tx{i}";'
        )
    gtf = tmp_path / "genes.gtf"
    gtf.write_text("\n".join(gtf_lines) + "\n")

    reads = []
    for j in range(900):
        t = rng.randrange(3)
        pos = rng.randrange(t_len - 50)
        reads.append((f"r{j}", seqs[t][pos : pos + 50]))
    fq = tmp_path / "reads.fastq"
    fq.write_text("".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    cli.main(["index", str(fa), str(gtf), "8", idx])
    cli.main([
        "quantify", str(fq), idx, str(gtf), "8", out,
        "-max_iterations", "5", "-disable_kmer_calibration",
        "-disable_length_calibration",
    ])
    got = {}
    for f in glob.glob(out + "/part-*"):
        for line in open(f):
            if line.strip():
                t_id, ab = line.strip().split(", ")
                got[t_id] = float(ab)
    assert set(got) == {"tx0", "tx1", "tx2"}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=0.08)

    # SAM e2e: the same reads as unaligned SAM records through the same
    # quantify entry point recover the same abundances
    sam = tmp_path / "reads.sam"
    sam.write_text(
        "@HD\tVN:1.6\n"
        + "".join(f"{n}\t4\t*\t0\t0\t*\t*\t0\t0\t{s}\t{'I' * len(s)}\n"
                  for n, s in reads)
    )
    out_sam = str(tmp_path / "out_sam")
    cli.main([
        "quantify", str(sam), idx, str(gtf), "8", out_sam,
        "-max_iterations", "5", "-disable_kmer_calibration",
        "-disable_length_calibration",
    ])
    got_sam = {}
    for f in glob.glob(out_sam + "/part-*"):
        for line in open(f):
            if line.strip():
                t_id, ab = line.strip().split(", ")
                got_sam[t_id] = float(ab)
    assert got_sam.keys() == got.keys()
    for t_id, v in got.items():
        assert got_sam[t_id] == pytest.approx(v, abs=1e-9)


def _write_twobit(path, seqs, order="<", n_blocks=None, mask_blocks=None):
    """Synthesize a spec-conformant .2bit file: seqs is {name: ACGT
    string (N positions listed in n_blocks)}; packing puts the first
    base in each byte's high bits, T=0 C=1 A=2 G=3."""
    import struct

    n_blocks = n_blocks or {}
    mask_blocks = mask_blocks or {}
    code = {"T": 0, "C": 1, "A": 2, "G": 3}
    names = list(seqs)
    header = struct.pack(f"{order}IIII", 0x1A412743, 0, len(names), 0)
    index_size = sum(1 + len(n) + 4 for n in names)
    offsets, records = {}, b""
    at = len(header) + index_size
    for name in names:
        s = seqs[name]
        nb = n_blocks.get(name, [])
        mb = mask_blocks.get(name, [])
        rec = struct.pack(f"{order}I", len(s))
        rec += struct.pack(f"{order}I", len(nb))
        rec += struct.pack(f"{order}{len(nb)}I", *[b[0] for b in nb])
        rec += struct.pack(f"{order}{len(nb)}I", *[b[1] for b in nb])
        rec += struct.pack(f"{order}I", len(mb))
        rec += struct.pack(f"{order}{len(mb)}I", *[b[0] for b in mb])
        rec += struct.pack(f"{order}{len(mb)}I", *[b[1] for b in mb])
        rec += struct.pack(f"{order}I", 0)
        packed = bytearray((len(s) + 3) // 4)
        for i, ch in enumerate(s):
            # N positions still carry a (dummy) 2-bit code; spec says
            # their packed value is arbitrary — use T(0)
            packed[i >> 2] |= code.get(ch.upper(), 0) << (6 - 2 * (i & 3))
        rec += bytes(packed)
        offsets[name] = at
        records += rec
        at += len(rec)
    index = b""
    for name in names:
        index += bytes([len(name)]) + name.encode() + __import__("struct").pack(
            f"{order}I", offsets[name]
        )
    path.write_bytes(header + index + records)


def test_read_twobit_round_trip(spark, tmp_path):
    seqs = {"chr1": "ACGTACGTACGTA", "chr2": "TTTTCCCCGGGG"}
    p = tmp_path / "ref.2bit"
    _write_twobit(p, seqs)
    got = {r.contig: r.sequence for r in bio.read_twobit(spark, str(p)).collect()}
    assert got == seqs


def test_read_twobit_n_and_mask_blocks_both_orders(spark, tmp_path):
    # N block over [4,6), soft-mask over [0,4): NN positions decode to
    # 'N', masked region lowercases (twoBitToFa's rendering)
    seqs = {"chrM": "ACGTTTGGCA"}
    for order, fname in (("<", "le.2bit"), (">", "be.2bit")):
        p = tmp_path / fname
        _write_twobit(
            p, seqs, order=order,
            n_blocks={"chrM": [(4, 2)]},
            mask_blocks={"chrM": [(0, 4)]},
        )
        got = bio.read_twobit(spark, str(p)).collect()[0]
        assert got.sequence == "acgtNNGGCA", (order, got.sequence)


def test_read_twobit_rejects_garbage(spark, tmp_path):
    p = tmp_path / "bad.2bit"
    p.write_bytes(b"\x00\x01\x02\x03not a twobit")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad signature"):
        bio.read_twobit(spark, str(p))


def test_load_genome_any_dispatches_twobit(spark, tmp_path):
    p = tmp_path / "ref.2bit"
    _write_twobit(p, {"c": "ACGT"})
    got = bio.load_genome_any(spark, str(p)).collect()
    assert [(r.contig, r.sequence) for r in got] == [("c", "ACGT")]


def test_read_twobit_chromosome_scale_decode_is_fast(spark, tmp_path):
    """A 100 Mbp contig (human-chromosome scale) decodes in seconds,
    not hours — the numpy path replaced a ~3e9-iteration per-base
    Python loop. Values are verified against an independent pure-Python
    bit extraction at 10k random positions (checking all 100M with the
    loop is exactly the cost the fix removed)."""
    import random
    import struct
    import time

    dna_size = 100_000_000
    rng = random.Random(7)
    packed = rng.randbytes((dna_size + 3) // 4)
    name = b"chrBig"
    header = struct.pack("<IIII", 0x1A412743, 0, 1, 0)
    offset = len(header) + 1 + len(name) + 4
    index = bytes([len(name)]) + name + struct.pack("<I", offset)
    n_blocks = [(1000, 50)]
    mask_blocks = [(2000, 100)]
    rec = struct.pack("<I", dna_size)
    rec += struct.pack("<I", len(n_blocks)) + struct.pack(
        "<1I", n_blocks[0][0]
    ) + struct.pack("<1I", n_blocks[0][1])
    rec += struct.pack("<I", len(mask_blocks)) + struct.pack(
        "<1I", mask_blocks[0][0]
    ) + struct.pack("<1I", mask_blocks[0][1])
    rec += struct.pack("<I", 0) + packed
    p = tmp_path / "big.2bit"
    p.write_bytes(header + index + rec)

    t0 = time.time()
    rows = bio.read_twobit(spark, str(p)).collect()
    elapsed = time.time() - t0
    # regression bound, not a benchmark: the numpy path runs ~10-35s
    # depending on session warmth and host load (observed 34.7s on an
    # idle host with a COLD session), while the per-base Python loop
    # this guards against takes ~30+ minutes. 120s separates those two
    # regimes under any plausible load without flaking.
    assert elapsed < 120.0, f"chromosome-scale decode took {elapsed:.1f}s"

    (row,) = rows
    seq = row.sequence
    assert len(seq) == dna_size
    bases = "TCAG"
    for _ in range(10_000):
        i = rng.randrange(dna_size)
        want = bases[(packed[i >> 2] >> (6 - 2 * (i & 3))) & 3]
        if n_blocks[0][0] <= i < n_blocks[0][0] + n_blocks[0][1]:
            want = "N"
        elif mask_blocks[0][0] <= i < mask_blocks[0][0] + mask_blocks[0][1]:
            want = want.lower()
        assert seq[i] == want, i


# ---------------------------------------------------------------- BAM

def _bam_record(name, flag, ref_id, pos0, mapq, cigar_ops, seq, qual):
    """Pack one alignment record per SAM spec §4.2 (little-endian)."""
    import struct

    body = struct.pack(
        "<iiBBHHHiiii",
        ref_id, pos0, len(name) + 1, mapq, 0, len(cigar_ops), flag,
        len(seq), -1, -1, 0,
    )
    body += name.encode() + b"\x00"
    for ln, op in cigar_ops:
        body += struct.pack("<I", (ln << 4) | op)
    codes = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
    packed = bytearray((len(seq) + 1) // 2)
    for i, ch in enumerate(seq):
        v = codes[ch]
        packed[i // 2] |= (v << 4) if i % 2 == 0 else v
    body += bytes(packed)
    if qual is None:
        body += b"\xff" * len(seq)
    else:
        body += bytes(q - 33 for q in qual.encode())
    return struct.pack("<i", len(body)) + body


def _bam_payload():
    import struct

    text = b"@HD\tVN:1.6\n"
    hdr = b"BAM\x01" + struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", 2)  # n_ref
    for rname, rlen in ((b"chr1", 1000), (b"chr2", 500)):
        hdr += struct.pack("<i", len(rname) + 1) + rname + b"\x00" + struct.pack("<i", rlen)
    recs = (
        _bam_record("read1", 0, 0, 99, 60, [(5, 0)], "ACGTA", "IIIII")   # 5M mapped
        + _bam_record("read2", 4, -1, -1, 0, [], "GGCC", None)           # unmapped
        + _bam_record("read3", 0x100, 1, 9, 30, [(4, 0)], "TTAA", "FFFF")  # secondary
    )
    return hdr, recs


def test_read_bam_plain_and_bgzf(spark, tmp_path):
    import gzip

    hdr, recs = _bam_payload()
    (tmp_path / "plain.bam").write_bytes(hdr + recs)
    # bgzf = concatenated gzip members; split mid-stream to prove the
    # multi-member inflate path
    blob = hdr + recs
    cut = len(hdr) + 10
    (tmp_path / "bgzf.bam").write_bytes(
        gzip.compress(blob[:cut]) + gzip.compress(blob[cut:])
    )
    for fname in ("plain.bam", "bgzf.bam"):
        rows = {r.read_name: r for r in bio.read_bam(spark, str(tmp_path / fname)).collect()}
        assert set(rows) == {"read1", "read2", "read3"}
        r1 = rows["read1"]
        assert (r1.contig, r1.pos, r1.mapq, r1.cigar, r1.sequence, r1.quality) == (
            "chr1", 100, 60, "5M", "ACGTA", "IIIII",
        )
        r2 = rows["read2"]
        assert r2.contig is None and r2.pos is None and r2.quality is None
        assert r2.sequence == "GGCC" and r2.cigar == "*" and r2.flag == 4
        assert rows["read3"].contig == "chr2" and rows["read3"].pos == 10


def test_reads_from_bam_drops_secondary_and_hashes_ids(spark, tmp_path):
    hdr, recs = _bam_payload()
    p = tmp_path / "r.bam"
    p.write_bytes(hdr + recs)
    reads = bio.reads_from_bam(bio.read_bam(spark, str(p))).collect()
    assert sorted(r.sequence for r in reads) == ["ACGTA", "GGCC"]  # secondary gone
    assert all(isinstance(r.read_id, int) for r in reads)
    # load_reads_any dispatches .bam
    via_any = bio.load_reads_any(spark, str(p)).collect()
    assert {r.sequence for r in via_any} == {"ACGTA", "GGCC"}


def test_reads_from_bam_paired_end_mates_get_distinct_ids(spark, tmp_path):
    # VERDICT r8: mates of a pair share a read NAME — the id must mix in
    # the pair-segment flag bits (0x40/0x80) or both mates collide
    hdr, _ = _bam_payload()
    # 0x1 paired | 0x40 first  /  0x1 paired | 0x80 second
    recs = (
        _bam_record("pair1", 0x41, 0, 10, 60, [(5, 0)], "ACGTA", "IIIII")
        + _bam_record("pair1", 0x81, 0, 50, 60, [(5, 0)], "TTTTC", "IIIII")
    )
    p = tmp_path / "paired.bam"
    p.write_bytes(hdr + recs)
    reads = bio.reads_from_bam(bio.read_bam(spark, str(p))).collect()
    assert len(reads) == 2
    assert len({r.read_id for r in reads}) == 2
    assert sorted(r.sequence for r in reads) == ["ACGTA", "TTTTC"]


def test_read_bam_rejects_garbage_and_truncation(spark, tmp_path):
    import pytest as _pytest

    (tmp_path / "bad.bam").write_bytes(b"NOTBAM__")
    with _pytest.raises(Exception, match="bad magic"):
        bio.read_bam(spark, str(tmp_path / "bad.bam")).collect()
    hdr, recs = _bam_payload()
    (tmp_path / "trunc.bam").write_bytes((hdr + recs)[:-7])
    with _pytest.raises(Exception, match="truncated BAM record"):
        bio.read_bam(spark, str(tmp_path / "trunc.bam")).collect()


# ---------------------------------------------------------------- SAM

_SAM_TEXT = (
    "@HD\tVN:1.6\n"
    "@SQ\tSN:chr1\tLN:1000\n"
    "@SQ\tSN:chr2\tLN:500\n"
    "read1\t0\tchr1\t100\t60\t5M\t*\t0\t0\tACGTA\tIIIII\n"
    "read2\t4\t*\t0\t0\t*\t*\t0\t0\tGGCC\t*\n"
    "read3\t256\tchr2\t10\t30\t4M\t*\t0\t0\tTTAA\tFFFF\n"
)


def test_read_sam_matches_bam_same_alignments(spark, tmp_path):
    # the text and binary forms of the SAME alignments must read
    # identically: _SAM_TEXT is the textual form of _bam_payload()
    hdr, recs = _bam_payload()
    (tmp_path / "x.bam").write_bytes(hdr + recs)
    (tmp_path / "x.sam").write_text(_SAM_TEXT)
    drop_sf = lambda rows: sorted(
        tuple(v for k, v in r.asDict().items() if k != "source_file") for r in rows
    )
    via_bam = drop_sf(bio.read_bam(spark, str(tmp_path / "x.bam")).collect())
    via_sam = drop_sf(bio.read_sam(spark, str(tmp_path / "x.sam")).collect())
    assert via_sam == via_bam and len(via_sam) == 3
    # schema parity too (same names/types -> downstream code agnostic)
    assert (
        bio.read_sam(spark, str(tmp_path / "x.sam")).schema
        == bio.read_bam(spark, str(tmp_path / "x.bam")).schema
    )


def test_read_sam_gzip_and_reads_adapter(spark, tmp_path):
    import gzip

    (tmp_path / "x.sam.gz").write_bytes(gzip.compress(_SAM_TEXT.encode()))
    rows = bio.read_sam(spark, str(tmp_path / "x.sam.gz")).collect()
    assert len(rows) == 3
    # load_reads_any dispatches .sam/.sam.gz; secondary (read3) drops
    reads = bio.load_reads_any(spark, str(tmp_path / "x.sam.gz")).collect()
    assert sorted(r.sequence for r in reads) == ["ACGTA", "GGCC"]
    assert len({r.read_id for r in reads}) == 2


def test_read_sam_malformed_line_raises(spark, tmp_path):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    (tmp_path / "bad.sam").write_text("@HD\tVN:1.6\nonly\tfour\tfields\there\n")
    with pytest.raises(SparkRuntimeException, match="malformed SAM"):
        bio.read_sam(spark, str(tmp_path / "bad.sam")).collect()


# ----------------------------------------------------- BAM + BAI region

def _ref_span(cigar_ops):
    return sum(ln for ln, op in cigar_ops if op in (0, 2, 3, 7, 8)) or 1


def _write_bgzf_bam_with_bai(tmp_path, fname, refs, members, bins_override=None):
    """Write a BGZF-layout BAM (header member + one gzip member per
    ``members`` entry, each entry a list of records as _bam_record args)
    and a spec-faithful sibling .bam.bai. Returns the bam path.

    ``bins_override``: {(ref_id, member_idx, rec_idx): bin} forces a
    record's chunk into a chosen bin (adversarial fixtures)."""
    import struct

    text = b"@HD\tVN:1.6\n"
    hdr = b"BAM\x01" + struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", len(refs))
    for rname, rlen in refs:
        hdr += struct.pack("<i", len(rname) + 1) + rname.encode() + b"\x00"
        hdr += struct.pack("<i", rlen)

    blobs = [gzip.compress(hdr)]
    placed = []  # (ref_id, beg0, end0, vbeg, vend, member_idx, rec_idx)
    for mi, recs in enumerate(members):
        payload = b""
        offs = []
        for args in recs:
            offs.append(len(payload))
            payload += _bam_record(*args)
        offs.append(len(payload))
        coffset = sum(len(b) for b in blobs)
        for ri, args in enumerate(recs):
            _, _, ref_id, pos0, _, cigar_ops, _, _ = args
            if ref_id < 0:
                continue
            vbeg = (coffset << 16) | offs[ri]
            vend = (coffset << 16) | offs[ri + 1]
            placed.append((ref_id, pos0, pos0 + _ref_span(cigar_ops), vbeg, vend, mi, ri))
        blobs.append(gzip.compress(payload))
    # last chunk of each member may also legally end at the next member
    bam_path = tmp_path / fname
    bam_path.write_bytes(b"".join(blobs))

    bai = bytearray(b"BAI\x01" + struct.pack("<i", len(refs)))
    for rid in range(len(refs)):
        mine = [p for p in placed if p[0] == rid]
        bins = {}
        for _, beg0, end0, vbeg, vend, mi, ri in mine:
            b = (bins_override or {}).get((rid, mi, ri), bio.reg2bin(beg0, end0))
            bins.setdefault(b, []).append((vbeg, vend))
        bai += struct.pack("<i", len(bins))
        for b, chunks in sorted(bins.items()):
            bai += struct.pack("<Ii", b, len(chunks))
            for cb, ce in chunks:
                bai += struct.pack("<QQ", cb, ce)
        n_intv = (max((p[2] - 1 for p in mine), default=0) >> 14) + 1 if mine else 0
        bai += struct.pack("<i", n_intv)
        for w in range(n_intv):
            lo, hi = w << 14, (w + 1) << 14
            over = [p[3] for p in mine if p[1] < hi and p[2] > lo]
            after = [p[3] for p in mine if p[1] >= hi]
            bai += struct.pack("<Q", min(over or after or [0]))
    (tmp_path / (fname + ".bai")).write_bytes(bytes(bai))
    return str(bam_path)


def _region_rows(spark, path, region):
    return sorted(
        (r.read_name, r.contig, r.pos, r.cigar)
        for r in bio.read_bam_region(spark, path, region).collect()
    )


def test_bam_region_basic(spark, tmp_path):
    path = _write_bgzf_bam_with_bai(
        tmp_path, "basic.bam",
        [("chr1", 100000), ("chr2", 500)],
        [
            [("a", 0, 0, 99, 60, [(5, 0)], "ACGTA", "IIIII")],
            [("b", 0, 0, 200, 60, [(10, 0)], "ACGTACGTAC", None)],
            [("c", 0, 0, 20000, 30, [(7, 0)], "ACGTACG", None)],
            [("d", 0, 1, 9, 30, [(4, 0)], "TTAA", None)],
            [("u", 4, -1, -1, 0, [], "GG", None)],
        ],
    )
    assert [r[0] for r in _region_rows(spark, path, "chr1:100-104")] == ["a"]
    assert [r[0] for r in _region_rows(spark, path, "chr1:198-202")] == ["b"]
    # 16kb linear-index window 1, deep bin level
    assert [r[0] for r in _region_rows(spark, path, "chr1:20001-20005")] == ["c"]
    assert [r[0] for r in _region_rows(spark, path, "chr2")] == ["d"]
    assert _region_rows(spark, path, "chr1:50000-60000") == []
    assert _region_rows(spark, path, "chrX:1-10") == []  # absent contig
    assert [r[0] for r in _region_rows(spark, path, "chr1")] == ["a", "b", "c"]


def test_bam_region_matches_full_scan_filter(spark, tmp_path):
    # the strong pin: for a pile of regions, the index-driven slice
    # equals read_bam + an exact overlap filter over the full scan
    recs = [
        (f"r{i}", 0, i % 2, (i * 997) % 30000, 60, [(5 + i % 9, 0)],
         "ACGTA" + "CG" * (i % 5), None)
        for i in range(40)
    ]
    path = _write_bgzf_bam_with_bai(
        tmp_path, "many.bam",
        [("chr1", 40000), ("chr2", 40000)],
        [recs[i:i + 3] for i in range(0, len(recs), 3)],
    )
    full = bio.read_bam(spark, path).collect()
    for region in ("chr1:1-1000", "chr1:5000-20000", "chr2:29000-30000",
                   "chr2:1-40000", "chr1:15000-15010"):
        contig, beg0, end0 = bio.parse_region(region)
        want = sorted(
            (r.read_name, r.contig, r.pos, r.cigar)
            for r in full
            if r.contig == contig and r.pos is not None
            and r.pos - 1 < end0
            and r.pos - 1 + (bio._cigar_ref_span(r.cigar) or 1) > beg0
        )
        assert _region_rows(spark, path, region) == want, region


def test_bam_region_virtual_offsets_exact(spark, tmp_path):
    # one member holds r1|rmid|r2. rmid overlaps the query but its
    # chunk is forced into a bin the query never visits, and the
    # r1/r2 chunks are non-adjacent so they cannot merge:
    #  - if a chunk walk overruns its vend, rmid leaks into the result
    #  - if a chunk walk ignores its begin uoffset, r1 duplicates
    path = _write_bgzf_bam_with_bai(
        tmp_path, "voff.bam",
        [("chr1", 50000)],
        [[
            ("r1", 0, 0, 100, 60, [(40000, 0)], "AC", None),
            ("rmid", 0, 0, 30001, 60, [(3, 0)], "ACG", None),
            ("r2", 0, 0, 30000, 60, [(5, 0)], "ACGTA", None),
        ]],
        bins_override={(0, 0, 1): 9999},
    )
    got = _region_rows(spark, path, "chr1:30001-30005")
    assert [g[0] for g in got] == ["r1", "r2"]


def test_bam_region_bai_guards(spark, tmp_path):
    path = _write_bgzf_bam_with_bai(
        tmp_path, "g.bam", [("chr1", 1000)],
        [[("a", 0, 0, 9, 60, [(5, 0)], "ACGTA", None)]],
    )
    # pseudo-bin 37450 entries are metadata, not chunks: graft one in
    import struct

    bai = (tmp_path / "g.bam.bai").read_bytes()
    # rewrite: n_bin+1 with a pseudo-bin carrying 2 bogus "chunks"
    (n_bin,) = struct.unpack_from("<i", bai, 8)
    pseudo = struct.pack("<Ii", 37450, 2) + struct.pack("<QQQQ", 1, 2, 3, 4)
    patched = bai[:8] + struct.pack("<i", n_bin + 1) + pseudo + bai[12:]
    (tmp_path / "g.bam.bai").write_bytes(patched)
    assert [r[0] for r in _region_rows(spark, path, "chr1:1-100")] == ["a"]

    (tmp_path / "g.bam.bai").write_bytes(b"JUNK" + patched[4:])
    with pytest.raises(Exception, match="bad magic"):
        _region_rows(spark, path, "chr1:1-100")


def test_parse_region_forms():
    assert bio.parse_region("chr1:100-200") == ("chr1", 99, 200)
    assert bio.parse_region("chr1:1,000-2,000") == ("chr1", 999, 2000)
    # bare contig = whole contig: end bound deferred to the per-shard
    # index geometry (2^29 would truncate long CSI-indexed contigs)
    assert bio.parse_region("chr1") == ("chr1", 0, None)
    assert bio.parse_region("chr1:7") == ("chr1", 6, 7)
    for bad in ("chr1:0-5", "chr1:9-3", ":1-2", "", "chr1:", ":"):
        with pytest.raises(ValueError):
            bio.parse_region(bad)


def test_cli_bam_region_e2e(spark, tmp_path):
    from rnadam_spark import cli

    path = _write_bgzf_bam_with_bai(
        tmp_path, "cli.bam", [("chr1", 100000)],
        [
            [("a", 0, 0, 99, 60, [(5, 0)], "ACGTA", "IIIII")],
            [("b", 0, 0, 20000, 60, [(10, 0)], "ACGTACGTAC", None)],
        ],
    )
    out = str(tmp_path / "slice")
    cli.main(["bam-region", path, "chr1:20001-20005", out])
    rows = spark.read.parquet(out).collect()
    assert [r.read_name for r in rows] == ["b"] and rows[0].pos == 20001


def _write_csi(bam_path, refs, placed, min_shift, depth):
    """Spec-faithful CSI sidecar for a fixture written by
    _write_bgzf_bam_with_bai's layout: per-bin loffset = min voffset of
    the records overlapping that bin's interval (the coordinate-sort
    lower bound the reader prunes with)."""
    import struct

    def bin_interval(b):
        s, t = min_shift + depth * 3, 0
        for level in range(depth + 1):
            nbins = 1 << (level * 3)
            if b < t + nbins:
                start = (b - t) << s
                return start, start + (1 << s)
            t += nbins
            s -= 3
        raise ValueError(b)

    csi = bytearray(b"CSI\x01" + struct.pack("<iii", min_shift, depth, 0))
    csi += struct.pack("<i", len(refs))
    for rid in range(len(refs)):
        mine = [p for p in placed if p[0] == rid]
        bins = {}
        for _, beg0, end0, vbeg, vend, _, _ in mine:
            b = bio.reg2bin(beg0, end0, min_shift, depth)
            bins.setdefault(b, []).append((vbeg, vend))
        csi += struct.pack("<i", len(bins))
        for b, chunks in sorted(bins.items()):
            lo, hi = bin_interval(b)
            loffset = min(
                (p[3] for p in mine if p[1] < hi and p[2] > lo), default=0
            )
            csi += struct.pack("<IQi", b, loffset, len(chunks))
            for cb, ce in chunks:
                csi += struct.pack("<QQ", cb, ce)
    import pathlib

    pathlib.Path(bam_path + ".csi").write_bytes(bytes(csi))


def test_reg2bin_generalization_matches_bai_constants():
    # the parameterized loops reproduce the SAM-spec fixed-constant
    # forms at (14, 5): finest level, a mid level, the root, and the
    # reg2bins candidate walk
    assert bio.reg2bin(99, 104) == 4681 + (99 >> 14)
    assert bio.reg2bin(30000, 30005) == 4681 + (30000 >> 14)
    assert bio.reg2bin(0, 1 << 20) == 73
    assert bio.reg2bin(100, 40100) == 585
    assert bio.reg2bin(0, 1 << 29) == 0
    got = bio._reg2bins(30000, 30005)
    want = [0]
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        want.extend(range(offset + (30000 >> shift), offset + (30004 >> shift) + 1))
    assert sorted(got) == sorted(want)
    assert bio._pseudo_bin(5) == 37450


def test_bam_region_csi_matches_full_scan_filter(spark, tmp_path):
    # same strong pin as the BAI sweep, driven through a CSI sidecar
    # with NON-default geometry (min_shift=12, depth=4) — the variable
    # min_shift/depth path has no BAI twin to hide behind
    recs = [
        (f"c{i}", 0, i % 2, (i * 991) % 20000, 60, [(6 + i % 7, 0)],
         "ACGTAC" + "GT" * (i % 4), None)
        for i in range(30)
    ]
    bam = _write_bgzf_bam_with_bai(
        tmp_path, "csi.bam", [("chr1", 30000), ("chr2", 30000)],
        [recs[i:i + 4] for i in range(0, len(recs), 4)],
    )
    import os

    os.remove(bam + ".bai")
    # rebuild 'placed' the way the BAI writer does, then write only CSI
    # (reuse the builder's bookkeeping by re-deriving from the full scan)
    full = bio.read_bam(spark, bam).collect()
    name_to_voff = {}
    # re-derive voffsets: members were written 4 records at a time, in
    # order, after the header member — reconstruct from the blobs
    data = open(bam, "rb").read()
    import zlib

    offs, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(data[pos:])
        offs.append((pos, raw))
        pos = len(data) - len(d.unused_data)
    placed = []
    ref_ids = {"chr1": 0, "chr2": 1}
    for coffset, raw in offs[1:]:
        at = 0
        while at < len(raw):
            import struct

            (bs,) = struct.unpack_from("<i", raw, at)
            rec, nxt = bio._decode_bam_record(raw, at, ["chr1", "chr2"])
            span = bio._cigar_ref_span(rec[5]) or 1
            placed.append(
                (ref_ids[rec[2]], rec[3] - 1, rec[3] - 1 + span,
                 (coffset << 16) | at, (coffset << 16) | nxt, 0, 0)
            )
            at = nxt
    _write_csi(bam, [("chr1", 30000), ("chr2", 30000)], placed,
               min_shift=12, depth=4)
    for region in ("chr1:1-500", "chr1:5000-15000", "chr2:19000-20000",
                   "chr2:1-30000", "chr1:10000-10005"):
        contig, beg0, end0 = bio.parse_region(region)
        want = sorted(
            (r.read_name, r.contig, r.pos, r.cigar)
            for r in full
            if r.contig == contig and r.pos is not None
            and r.pos - 1 < end0
            and r.pos - 1 + (bio._cigar_ref_span(r.cigar) or 1) > beg0
        )
        assert _region_rows(spark, bam, region) == want, region


def test_bam_region_both_sidecars_read_once(spark, tmp_path):
    # a shard carrying BOTH .bai and .csi must contribute each record
    # once (BAI preferred), not twice
    bam = _write_bgzf_bam_with_bai(
        tmp_path, "both.bam", [("chr1", 100000)],
        [[("a", 0, 0, 99, 60, [(5, 0)], "ACGTA", None)]],
    )
    import struct

    placed = [(0, 99, 104, 0, 0, 0, 0)]
    # cheap valid CSI: recompute voffsets from the file layout
    data = open(bam, "rb").read()
    import zlib

    d = zlib.decompressobj(wbits=31)
    d.decompress(data)
    m1 = len(data) - len(d.unused_data)  # header member size
    placed = [(0, 99, 104, m1 << 16, (len(data)) << 16, 0, 0)]
    _write_csi(bam, [("chr1", 100000)], placed, min_shift=14, depth=5)
    got = _region_rows(spark, bam, "chr1:95-110")
    assert [g[0] for g in got] == ["a"]


def test_csi_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        bio._parse_csi(b"JUNKxxxx")


def test_bam_region_csi_bare_contig_beyond_2pow29(spark, tmp_path):
    # a bare-contig region ('chr1') on a CSI-indexed contig LONGER than
    # 2^29 bp must return records past 512 Mbp: the whole-contig end
    # bound resolves per shard from the index geometry
    # (1 << (min_shift + 3*depth)), never a fixed 1 << 29
    import os
    import zlib

    far = 600_000_000  # > 1 << 29
    bam = _write_bgzf_bam_with_bai(
        tmp_path, "long.bam", [("chr1", 700_000_000)],
        [
            [("near", 0, 0, 99, 60, [(5, 0)], "ACGTA", None)],
            [("deep", 0, 0, far, 60, [(5, 0)], "ACGTA", None)],
        ],
    )
    os.remove(bam + ".bai")  # BAI cannot address pos >= 2^29
    data = open(bam, "rb").read()
    offs, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(data[pos:])
        offs.append((pos, raw))
        pos = len(data) - len(d.unused_data)
    placed = []
    for coffset, raw in offs[1:]:
        at = 0
        while at < len(raw):
            rec, nxt = bio._decode_bam_record(raw, at, ["chr1"])
            span = bio._cigar_ref_span(rec[5]) or 1
            placed.append(
                (0, rec[3] - 1, rec[3] - 1 + span,
                 (coffset << 16) | at, (coffset << 16) | nxt, 0, 0)
            )
            at = nxt
    # depth=6 → max addressable coordinate 1 << (14 + 18) = 2^32
    _write_csi(bam, [("chr1", 700_000_000)], placed, min_shift=14, depth=6)
    assert [g[0] for g in _region_rows(spark, bam, "chr1")] == ["deep", "near"]
    got = _region_rows(spark, bam, "chr1:600000000-600000010")
    assert [g[0] for g in got] == ["deep"]


def test_bam_ingest_matches_gate_oracle(spark, sf_dir):
    # the r13 gate row's own pin at pytest scale: spec-packed shards
    # (plain + two-member gzip) through read_bam vs the DuckDB oracle
    # that recomputes every record from parquet alone
    import os

    import duckdb

    from rnadam_spark.queries.ingest_q import _BAM_SQL, bam_ingest

    got = sorted(
        tuple(r)
        for r in bam_ingest(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_BAM_SQL).fetchall()))
    assert got == want and len(got) > 100
    # the adversarial sentinels all actually occur at this sf
    assert any(r[2] is None for r in got)  # unmapped -> null contig
    assert any(r[3] is None for r in got)  # pos0 -1 -> null pos
    assert any(r[7] is None and r[6] for r in got)  # 0xff qual fill
    assert any(r[5] == "*" and r[6] == "" for r in got)  # l_seq 0
    assert any(r[5].endswith("M1S") for r in got)  # multi-op cigar
    assert any(r[6].startswith("N") for r in got)  # N nibble (code 15)


def test_bam_region_ingest_matches_gate_oracle(spark, sf_dir):
    # the r13 second gate row's pytest pin: spec-packed multi-member
    # shards + literal-macro BAI sidecars through read_bam_region vs
    # the DuckDB oracle's full-scan overlap predicate
    import os

    import duckdb

    from rnadam_spark.queries.ingest_q import _BAM_REGION_SQL, bam_region_ingest

    got = sorted(tuple(r) for r in bam_region_ingest(spark, sf_dir).collect())
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_BAM_REGION_SQL).fetchall()))
    assert got == want and got
