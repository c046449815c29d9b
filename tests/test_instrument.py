"""Per-stage instrumentation: the timers mirror the reference's named
stage surface (Timers.scala:28-62) and must not change results."""

from rnadam_spark import instrument as ins
from rnadam_spark.algorithms.index import build_index
from rnadam_spark.algorithms.quantify import quantify
from rnadam_spark.schemas import GENOME, READS, TRANSCRIPTS

TEST_SEQ = "CAATCCTTCGCCGCAGTGCA"


def _fixtures(spark):
    transcripts = spark.createDataFrame(
        [
            ("transcript1", "gene1", True, [("exon1", "region1", 0, 10)]),
            ("transcript2", "gene1", True, [("exon2", "region2", 11, 20)]),
        ],
        TRANSCRIPTS,
    )
    genome = spark.createDataFrame(
        [("region1", TEST_SEQ), ("region2", TEST_SEQ)], GENOME
    )
    return transcripts, genome


def test_index_stage_timers(spark):
    transcripts, genome = _fixtures(spark)
    timers = ins.StageTimers()
    build_index(transcripts, genome, 5, timers=timers)
    assert set(timers.as_dict()) == {
        ins.EXTRACT,
        ins.SPLIT_KMERS,
        ins.GENERATE_CLASSES,
        ins.GENERATE_INDICES,
    }
    assert all(v >= 0 for v in timers.stages.values())


def test_quantify_stage_timers_and_identical_result(spark):
    transcripts, genome = _fixtures(spark)
    k2c, _, ct = build_index(transcripts, genome, 5)
    reads = spark.createDataFrame(
        [(0, TEST_SEQ[:10]), (1, TEST_SEQ[11:])], READS
    )
    args = dict(k=5, max_iterations=2, calibrate_kmer_bias=False, calibrate_length_bias=False)
    plain = quantify(reads, k2c, ct, transcripts, **args)
    timers = ins.StageTimers()
    timed = quantify(reads, k2c, ct, transcripts, timers=timers, **args)

    got_plain = {r.t_id: round(r.abundance, 9) for r in plain.select("t_id", "abundance").collect()}
    got_timed = {r.t_id: round(r.abundance, 9) for r in timed.select("t_id", "abundance").collect()}
    assert got_plain == got_timed  # instrumentation never changes results

    names = set(timers.as_dict())
    assert {
        ins.EXTRACT_LENGTHS,
        ins.COUNT_KMERS,
        ins.COUNT_CLASSES,
        ins.NORMALIZING,
        ins.INIT_EM,
        ins.EM_ITER,
        ins.E_STAGE,
        ins.M_STAGE,
    } <= names
    # the iteration timer wraps its E and M stages
    assert timers.stages[ins.EM_ITER] >= timers.stages[ins.E_STAGE]


def test_skew_report_identifies_hot_key(spark):
    from rnadam_spark.instrument import skew_report

    rows = [(i, "hot" if i < 9000 else f"k{i % 13}") for i in range(10000)]
    df = spark.createDataFrame(rows, "id BIGINT, key STRING")
    rep = skew_report(df, ["key"], top=3, target_rows_per_task=1000)
    assert rep["n_rows"] == 10000 and rep["n_groups"] == 14
    assert rep["max"] == 9000
    assert rep["top"][0]["key"] == {"key": "hot"}
    assert rep["top"][0]["n"] == 9000
    assert abs(rep["top"][0]["share"] - 0.9) < 1e-9
    # 9000 rows / 1000-per-task target -> salt 9
    assert rep["suggested_salt"] == 9
    # uniform data needs no salt
    uni = spark.createDataFrame(
        [(i, f"k{i % 20}") for i in range(2000)], "id BIGINT, key STRING"
    )
    assert skew_report(uni, ["key"], target_rows_per_task=1000)["suggested_salt"] == 1
