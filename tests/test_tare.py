"""Tare calibration tests, ported from TareSuite.scala (featurization
goldens, GC-bias property test, length-bias goldens)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from rnadam_spark.algorithms import tare
from rnadam_spark.algorithms.generators import generate_string
from rnadam_spark.schemas import KMER_COUNTS


def test_featurize_2mer_one_hot(spark):
    # TareSuite.scala:48-58: a single dinucleotide k-mer is a one-hot
    # fraction vector; label = log(multiplicity)
    df = spark.createDataFrame([("AC", 10)], KMER_COUNTS)
    row = tare.featurize_kmers(df).collect()[0]
    assert abs(row.label - math.log(10.0)) < 1e-9
    expected = [0.0] * 16
    expected[1] = 1.0  # AC → 4*0 + 1
    assert row.features == expected


def test_featurize_invalid_bases_filtered(spark):
    # TareSuite.scala:60-66: "ANGNC" → contexts AN,NG,GN,NC all invalid
    # except none... reference uses "ACNGA"-style: only valid contexts
    # remain; here "ACNGT": AC and GT valid → 0.5/0.5
    df = spark.createDataFrame([("ACNGT", 1)], KMER_COUNTS)
    row = tare.featurize_kmers(df).collect()[0]
    expected = [0.0] * 16
    expected[1] = 0.5   # AC
    expected[11] = 0.5  # GT → 4*2 + 3
    assert [round(x, 9) for x in row.features] == expected


def test_featurize_illegal_kmer_raises(spark):
    # TareSuite.scala:36-46: a k-mer with no valid context throws
    df = spark.createDataFrame([("NN", 1)], KMER_COUNTS)
    with pytest.raises(Exception, match="does not contain any valid contexts"):
        tare.featurize_kmers(df).collect()


def test_calibrate_kmers_reduces_gc_bias(spark):
    # TareSuite.scala:68-94: synthetic counts from a known log-space GC
    # bias curve; after calibration the max count must drop and the min
    # must rise (directional property, solver-independent)
    rng = random.Random(121212)
    seq = generate_string(500, rng)
    kmers = [seq[i : i + 15] for i in range(len(seq) - 14)]
    rows = []
    for km in set(kmers):
        gc = sum(c in "GCgc" for c in km) / 15.0
        count = int(100.0 * math.exp(2.0 + (gc - 0.5)))
        rows.append((km, count))
    df = spark.createDataFrame(rows, KMER_COUNTS)
    calibrated = {r.kmer: r.cnt for r in tare.calibrate_kmers(df).collect()}
    raw = dict(rows)
    assert max(calibrated.values()) < max(raw.values())
    assert min(calibrated.values()) > min(raw.values())


def test_calibrate_tx_len_bias_golden(spark):
    # TareSuite.scala:96-118: abundance ∝ length in → uniform 0.25 out
    mu = spark.createDataFrame(
        [("a", 0.28), ("b", 0.17), ("c", 0.31), ("d", 0.24)], ["t_id", "mu"]
    )
    t_len = spark.createDataFrame(
        [("a", 28), ("b", 17), ("c", 31), ("d", 24)], ["t_id", "t_len"]
    )
    got = {r.t_id: r.mu for r in tare.calibrate_tx_len_bias(mu, t_len).collect()}
    for t in "abcd":
        assert abs(got[t] - 0.25) < 1e-6, got


def test_calibrate_tx_len_bias_sampled_fit(spark):
    # M3 (Tare.scala:152-156): sampling_rate < 1 subsamples the FIT
    # input (the rescale still covers every transcript). Points are
    # exactly collinear in log-space (µ ∝ len), so any non-degenerate
    # subsample recovers the same line; tolerance loosened for the
    # sample-size noise in the closed-form moments.
    n = 101
    rng = random.Random(113402062015)
    lengths = [rng.randrange(1, 11) for _ in range(n)]
    total = sum(lengths)
    mu = spark.createDataFrame(
        [(str(i), lengths[i] / total) for i in range(n)], ["t_id", "mu"]
    )
    t_len = spark.createDataFrame(
        [(str(i), lengths[i]) for i in range(n)], ["t_id", "t_len"]
    )
    got = {
        r.t_id: r.mu
        for r in tare.calibrate_tx_len_bias(mu, t_len, sampling_rate=0.5).collect()
    }
    assert len(got) == n  # every transcript rescaled, not just the sample
    for i in range(n):
        assert abs(got[str(i)] - 1.0 / n) < 0.02


@pytest.mark.parametrize("n", [11, 101])
def test_calibrate_tx_len_bias_random(spark, n):
    # TareSuite.scala:120-147 shape: abundance ∝ length → uniform 1/n
    rng = random.Random(113402062015)
    lengths = [rng.randrange(1, 11) for _ in range(n)]
    total = sum(lengths)
    mu = spark.createDataFrame(
        [(str(i), lengths[i] / total) for i in range(n)], ["t_id", "mu"]
    )
    t_len = spark.createDataFrame(
        [(str(i), lengths[i]) for i in range(n)], ["t_id", "t_len"]
    )
    got = {r.t_id: r.mu for r in tare.calibrate_tx_len_bias(mu, t_len).collect()}
    for i in range(n):
        assert abs(got[str(i)] - 1.0 / n) < 1e-6


def test_dinuc_features_match_retired_oracle(spark, sf_dir):
    # gate rotation r8 retired the dinuc_context_features CORRECTNESS
    # row (slot → pagerank/frontier_dedup); its DuckDB oracle lives on
    # here so the shingle→run-length histogram kernel stays
    # cross-checked engine-to-engine
    import os

    import duckdb

    from rnadam_spark.queries.genomics_q import _DINUC_SQL, dinuc_context_features

    got = sorted(
        (r.doc_id, r.bigram, r.cnt, r.frac)
        for r in dinuc_context_features(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(map(tuple, con.execute(_DINUC_SQL).fetchall()))
    assert got == want and got
