"""CLI end-to-end: index → quantify over parquet fixtures, through the
real command surface (SURVEY.md §3 entry points 1–2)."""

import glob

from rnadam_spark import cli
from rnadam_spark.algorithms import generators as gen
from rnadam_spark.schemas import GENOME, READS, TRANSCRIPTS


def test_cli_index_then_quantify(spark, tmp_path):
    # lay the generated transcripts end-to-end on one contig; the
    # genome is their concatenation, exons address slices of it
    t_len = [400, 300, 350]
    abundances = [0.5, 0.3, 0.2]
    seqs, names, _, _ = gen.generate_independent_transcripts(15, t_len, seed=77)
    genome_seq = "".join(seqs)
    offsets = []
    pos = 0
    for s in seqs:
        offsets.append(pos)
        pos += len(s)

    genome_df = spark.createDataFrame([("chr1", genome_seq)], GENOME)
    transcripts_df = spark.createDataFrame(
        [
            (
                names[i],
                "g1",
                True,
                # hull [start, end) must address exactly the transcript
                # slice; width−1 length rule needs end = start + len + 1
                [(names[i] + "e", "chr1", offsets[i], offsets[i] + len(seqs[i]))],
            )
            for i in range(len(seqs))
        ],
        TRANSCRIPTS,
    )
    reads = gen.generate_reads(seqs, abundances, 4000, 50, seed=88)
    reads_df = spark.createDataFrame(list(enumerate(reads)), READS)

    genome_p = str(tmp_path / "genome.parquet")
    genes_p = str(tmp_path / "genes.parquet")
    reads_p = str(tmp_path / "reads.parquet")
    genome_df.write.parquet(genome_p)
    transcripts_df.write.parquet(genes_p)
    reads_df.write.parquet(reads_p)

    index_prefix = str(tmp_path / "index")
    cli.main(["index", genome_p, genes_p, "15", index_prefix])
    assert glob.glob(index_prefix + "_kmers/*.parquet")
    assert glob.glob(index_prefix + "_classes/*.parquet")

    out = str(tmp_path / "result")
    cli.main(
        [
            "quantify", reads_p, index_prefix, genes_p, "15", out,
            "-max_iterations", "15",
            "-disable_kmer_calibration", "-disable_length_calibration",
        ]
    )
    lines = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            lines.extend(line.strip() for line in fh if line.strip())
    got = {}
    for line in lines:
        t_id, ab = line.split(", ")
        got[t_id] = float(ab)
    assert len(got) == 3
    # width−1 length rule makes t_len = len−1 (the reference's own e2e
    # setup has the same off-by-one, QuantifySuite.scala:400-407)
    for i, expected in enumerate(abundances):
        assert abs(got[names[i]] - expected) <= 0.05, (got, expected)
