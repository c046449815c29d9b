"""Sailfish-style EM isoform quantification, DataFrame-native.

Re-expresses ``Quantify.apply`` (rice-core/.../algorithms/
Quantify.scala:42-127) and its helpers. Every driver-side
``collectAsMap``/closure in the reference becomes a broadcast join, the
``flatMap → groupByKey → re-emit`` E-step (Quantify.scala:200-212)
becomes one window aggregate, and the unbounded-lineage EM loop
(Quantify.scala:105-114 — a known scaling hazard) truncates its plan
with ``localCheckpoint`` on the tiny per-transcript state.

State tables (all flat):
  kmer_counts        (kmer, cnt)
  kmer_to_class      (kmer, class_id)
  class_transcripts  (class_id, t_id)          — static membership edges
  class_counts       (class_id, cnt)
  rel_kmers          (class_id, rel_p)         — class share of all k-mers
  alpha              (class_id, t_id, alpha)   — E-state
  mu                 (t_id, mu)                — M-state (n_transcripts rows)

Scale design (100 TB): the membership edges are enriched with BOTH
static dimensions (``rel_kmers``, ``t_len``) once up front and cached,
so each EM iteration is exactly one broadcast (the tiny per-transcript
``mu`` table) plus two shuffles of the edge table — the window by
class_id and the groupBy t_id — independent of iteration count, with no
dimension joins inside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rnadam_spark.functions.shingles import char_shingles
from rnadam_spark.lineage import truncate_lineage


def count_read_kmers(reads: DataFrame, k: int) -> DataFrame:
    """(kmer, cnt): ADAM's ``adamCountKmers`` (called Quantify.scala:58-60)
    as explode(shingles) → partial+final hash aggregate."""
    return (
        reads.select(F.explode(char_shingles("sequence", k)).alias("kmer"))
        .groupBy("kmer")
        .agg(F.count("*").alias("cnt"))
    )


def transcript_lengths(transcripts: DataFrame) -> DataFrame:
    """(t_id, t_len): Σ per exon of (end − start − 1) — the reference's
    ``region.width - 1`` rule, quirk preserved (Quantify.scala:137-141;
    golden 375/350 at QuantifySuite.scala:322-340). Stays a DataFrame —
    the reference collectAsMap'd this to the driver."""
    return transcripts.select(
        "t_id",
        F.aggregate(
            "exons", F.lit(0).cast("long"), lambda acc, e: acc + (e["end"] - e["start"] - 1)
        ).alias("t_len"),
    )


def map_kmers_to_classes(kmer_counts: DataFrame, kmer_to_class: DataFrame) -> DataFrame:
    """(class_id, cnt): J1 + A6 (Quantify.scala:153-158). A k-mer mapped
    to several classes contributes its count to each, as in the
    reference's pair-RDD join."""
    return (
        kmer_to_class.join(kmer_counts, "kmer")
        .groupBy("class_id")
        .agg(F.sum("cnt").alias("cnt"))
    )


def relative_class_kmers(class_counts: DataFrame) -> DataFrame:
    """(class_id, rel_p): each class's share of the total k-mer count
    (Quantify.scala:79-87). The total is a broadcast 1-row aggregate —
    an empty-partition window would funnel the whole class table
    through one task at scale, and a driver collect (the reference's
    ``reduce`` + ``collectAsMap``) caps at driver memory."""
    total = class_counts.agg(F.sum("cnt").alias("_total"))
    return class_counts.crossJoin(F.broadcast(total)).select(
        "class_id", (F.col("cnt") / F.col("_total")).alias("rel_p")
    )


def _extra_cols(class_transcripts: DataFrame) -> list[str]:
    """Static dimension columns riding on an enriched edge table (the
    EM loop pre-joins ``rel_p``/``t_len`` into the cached edges once, so
    per-iteration plans carry them as passthrough columns instead of
    re-broadcasting the dimension tables every iteration)."""
    return [c for c in class_transcripts.columns if c not in ("class_id", "t_id")]


def initialize_em(
    class_counts: DataFrame, class_transcripts: DataFrame, skew_safe: bool = False
) -> DataFrame:
    """alpha₀ (class_id, t_id, alpha): split each class count equally
    across its member transcripts (A11, Quantify.scala:175-184).
    ``skew_safe`` swaps the per-class count window for groupBy +
    broadcast join — same rationale as ``e_step``. Extra columns on
    ``class_transcripts`` pass through."""
    extra = _extra_cols(class_transcripts)
    joined = class_counts.join(class_transcripts, "class_id")
    if skew_safe:
        sizes = class_transcripts.groupBy("class_id").agg(F.count("*").alias("_n"))
        return joined.join(F.broadcast(sizes), "class_id").select(
            "class_id",
            "t_id",
            *extra,
            (F.col("cnt").cast("double") / F.col("_n")).alias("alpha"),
        )
    w = Window.partitionBy("class_id")
    return joined.select(
        "class_id",
        "t_id",
        *extra,
        (F.col("cnt").cast("double") / F.count("*").over(w)).alias("alpha"),
    )


def e_step(mu: DataFrame, class_transcripts: DataFrame, skew_safe: bool = False) -> DataFrame:
    """E-step (A9, Quantify.scala:200-212): α(j,i) = µ̂_i / Σ_{t∈s_j} µ̂_t.

    Default: one broadcast join + one window — the reference's double
    shuffle (flatMap → groupByKey) collapses into a single
    partition-by-class window aggregate. Measured fastest at bench
    scale, but ``Window.partitionBy(class_id)`` places a whole class in
    ONE task — a mega-class (a handful of classes holding most edges,
    plausible when classes key on k-mer multiplicity) funnels there.

    ``skew_safe=True`` computes the class sums as groupBy + broadcast
    join instead: sum() partial-aggregates map-side, so a hot class
    contributes one row per input partition to the exchange regardless
    of its size. Same α bit-for-bit (one double addition order may
    differ; both paths pass the same goldens).

    Measured A/B (bench.py ``ab`` block, re-run per round): at sf0.1
    with no mega-class the window form wins (8.1s vs 8.8s for the
    5-iteration flagship over class_id-pre-partitioned cached edges —
    both paths reuse that partitioning, so the gap is the skew_safe
    extra aggregate+broadcast), and it stays the default; the crossover
    is a class whose edge count dwarfs a single task (≈ rows-per-task
    at the configured shuffle width), where the window funnels and
    skew_safe keeps scaling — flip it on when class sizes are
    unbounded. Parity on the mega-class shape itself is pinned by
    tests/test_quantify_e2e.py.

    Extra columns on ``class_transcripts`` pass through (the EM loop's
    enriched edge table)."""
    extra = _extra_cols(class_transcripts)
    edges = class_transcripts.join(F.broadcast(mu.select("t_id", "mu")), "t_id")
    if skew_safe:
        class_sums = edges.groupBy("class_id").agg(F.sum("mu").alias("_mu_sum"))
        return edges.join(F.broadcast(class_sums), "class_id").select(
            "class_id", "t_id", *extra, (F.col("mu") / F.col("_mu_sum")).alias("alpha")
        )
    w = Window.partitionBy("class_id")
    return edges.select(
        "class_id", "t_id", *extra, (F.col("mu") / F.sum("mu").over(w)).alias("alpha")
    )


def normalize_mu(mus: DataFrame, col: str = "mu") -> DataFrame:
    """µ̂ = µ / Σµ via broadcast 1-row total (an empty-partition window
    would funnel all transcripts through one task)."""
    total = mus.agg(F.sum(col).alias("_total"))
    return mus.crossJoin(F.broadcast(total)).select(
        "t_id", (F.col(col) / F.col("_total")).alias("mu")
    )


def m_step(
    alpha: DataFrame,
    t_len: DataFrame | None,
    k: int,
    rel_kmers: DataFrame | None,
    normalize: bool = True,
) -> DataFrame:
    """M-step (A10, Quantify.scala:238-275): µ_i = Σ_j α(j,i)·k_j / l̂_i,
    then normalize µ̂_i = µ_i / Σ µ. With ``rel_kmers``/``t_len`` given,
    they ride broadcast joins (the reference broadcast tLen and closed
    over a collected rel-kmers map); passing ``None`` means ``alpha``
    already carries ``rel_p``/``t_len`` columns — the EM loop pre-joins
    both static dimensions into its cached edge table once, so the
    per-iteration plan has NO dimension joins at all (one groupBy; the
    only broadcast in the loop is the tiny µ table in the E-step).

    ``normalize=False`` skips the per-step global rescale: the E-step's
    fraction-of-group is scale-invariant, so inside the EM loop the
    normalization is mathematically inert — the reference normalized
    every step (Quantify.scala:261-275), which costs a second
    materialization of the µ subtree (the total's aggregate) plus a
    broadcast per iteration. The loop normalizes once at the end; the
    unit goldens pin the normalized single-step form."""
    x = alpha if rel_kmers is None else alpha.join(F.broadcast(rel_kmers), "class_id")
    if t_len is None:
        # t_len is functionally dependent on t_id; grouping on both
        # keeps it available without a join or first()
        g = x.groupBy("t_id", "t_len").agg(
            F.sum(F.col("alpha") * F.col("rel_p")).alias("sum_alpha")
        )
    else:
        g = (
            x.groupBy("t_id")
            .agg(F.sum(F.col("alpha") * F.col("rel_p")).alias("sum_alpha"))
            .join(F.broadcast(t_len), "t_id")
        )
    mus = g.select(
        "t_id",
        (F.col("sum_alpha") / (F.col("t_len") - F.lit(k) + 1)).alias("mu_raw"),
    )
    if not normalize:
        return mus.withColumnRenamed("mu_raw", "mu")
    return normalize_mu(mus, "mu_raw")


def join_transcripts(transcripts: DataFrame, mu: DataFrame) -> DataFrame:
    """J3 (Quantify.scala:286-295): attach abundances to the full
    transcript descriptors."""
    return transcripts.join(mu.withColumnRenamed("mu", "abundance"), "t_id")


def quantify(
    reads: DataFrame,
    kmer_to_class: DataFrame,
    class_transcripts: DataFrame,
    transcripts: DataFrame,
    k: int,
    max_iterations: int,
    calibrate_kmer_bias: bool = True,
    calibrate_length_bias: bool = True,
    checkpoint_every: int = 2,
    timers=None,
    skew_safe: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full pipeline (Quantify.scala:42-127): returns transcripts with
    an ``abundance`` column (relative abundances, sum 1).

    ``timers`` (an ``instrument.StageTimers``) forces + times each
    stage under the reference's Timers.scala names; ``None`` (the
    default) keeps the pipeline fully lazy.

    ``checkpoint_dir``: when set, per-iteration lineage truncation uses
    reliable ``checkpoint()`` into that fault-tolerant directory instead
    of ``localCheckpoint`` — executor loss mid-loop then recovers by
    re-reading checkpointed state instead of failing the job (see
    rnadam_spark.lineage)."""
    from rnadam_spark import instrument as ins
    from rnadam_spark.algorithms import tare

    # static across the loop and broadcast every iteration — cache so
    # each broadcast exchange reads the materialized rows instead of
    # re-deriving from the source scan
    t_len = transcript_lengths(transcripts).cache()
    t_len = ins.timed(timers, ins.EXTRACT_LENGTHS, t_len)

    kmer_counts = ins.timed(timers, ins.COUNT_KMERS, count_read_kmers(reads, k))
    if calibrate_kmer_bias:
        kmer_counts = ins.timed(timers, ins.TARE_KMERS, tare.calibrate_kmers(kmer_counts))

    class_counts = map_kmers_to_classes(kmer_counts, kmer_to_class)
    if timers is None:  # timed() caches; avoid double-cache under timers
        class_counts = class_counts.cache()
    class_counts = ins.timed(timers, ins.COUNT_CLASSES, class_counts)
    rel_kmers = relative_class_kmers(class_counts).cache()  # static, broadcast per iteration
    rel_kmers = ins.timed(timers, ins.NORMALIZING, rel_kmers)

    # the static membership-edge table, enriched ONCE with both static
    # dimensions (class share rel_p, transcript length), PRE-PARTITIONED
    # on class_id, and cached. The repartition is paid once at cache
    # time and every iteration's E-step window then reuses the cached
    # hashpartitioning(class_id) — its plan is broadcast-join + local
    # sort + window with NO exchange (verified in tests/test_plans.py),
    # so each EM iteration moves the edge table over the network exactly
    # once (the M-step groupBy) instead of twice. Classes absent from
    # class_counts drop here; their α rows carried zero weight into the
    # M-step's rel_p join anyway.
    edges = (
        class_transcripts.join(F.broadcast(rel_kmers), "class_id")
        .join(F.broadcast(t_len), "t_id")
        .repartition("class_id")
        .cache()
    )

    return em_loop(
        class_counts,
        edges,
        transcripts,
        k,
        max_iterations,
        calibrate_length_bias=calibrate_length_bias,
        t_len=t_len,
        checkpoint_every=checkpoint_every,
        timers=timers,
        skew_safe=skew_safe,
        checkpoint_dir=checkpoint_dir,
    )


def em_loop(
    class_counts: DataFrame,
    edges: DataFrame,
    transcripts: DataFrame,
    k: int,
    max_iterations: int,
    calibrate_length_bias: bool = True,
    t_len: DataFrame | None = None,
    checkpoint_every: int = 2,
    timers=None,
    skew_safe: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The EM driver core over PRE-BUILT state — the loop every entry
    point shares. ``quantify`` builds the state from reads + index
    tables and delegates here; callers whose class keys admit a cheaper
    state construction (``em_quantify``'s per-(doc, cnt) classes fuse
    class_counts and the enriched edge table into projections of ONE
    aggregate — r10 stage attribution put 87% of the flagship's sf100
    wall time in the generic state build, not this loop) hand their
    state straight to the same iterations, so the gate's one-iteration
    twin (``em_two_steps``, via quantify) still certifies the exact
    code path the flagship runs for 5.

    ``class_counts`` is (class_id, cnt); ``edges`` is the ENRICHED
    membership table (class_id, t_id, rel_p, t_len, ...), pre-partitioned
    on class_id and cached by the caller (each iteration's E-step window
    then reuses that partitioning with no exchange). ``t_len`` is only
    needed when ``calibrate_length_bias`` is on."""
    from rnadam_spark import instrument as ins
    from rnadam_spark.algorithms import tare

    if calibrate_length_bias and t_len is None:
        raise ValueError("calibrate_length_bias=True requires t_len")

    alpha = initialize_em(class_counts, edges, skew_safe=skew_safe)
    mu = m_step(alpha, None, k, None, normalize=False)
    mu = ins.timed(timers, ins.INIT_EM, mu)

    for i in range(max_iterations):
        # mu is n_transcripts rows: truncating the whole EM lineage here
        # is near-free (the reference never truncated — its plan depth
        # grew linearly with iterations). Cadence is a measured trade:
        # without ANY truncation each broadcast exchange re-executes
        # all prior iterations (45.9s vs 8.3s for the 5-iteration
        # flagship at sf0.1, checkpoint_every 5 vs 1, r8); every-2 —
        # one eager action per TWO iterations, the skipped iteration's
        # subtree materializing once inside the next E-step broadcast —
        # lost under r8's 32-partition edge cache (9.20 vs 8.66s) but
        # WINS after r13 §7 sized the cache from the data: loop-only
        # min-of-k on the final tree, every_2 vs every_1 — sf10 12.14
        # vs 13.73s, sf100 58.29 vs 61.57s (sf0.1 is a coin flip across
        # artifacts), meeting the both-decades adoption bar, so 2 is
        # the default; ab.em_loop re-measures the cadence every round.
        # Also measured and rejected: transporting mu through the
        # driver (collect + createDataFrame per iteration — mu is
        # bounded model state, so it is legal) was SLOWER than
        # localCheckpoint at sf0.1 (5.23s vs 4.91s warm min-of-3,
        # identical results): the collect round-trip costs more than
        # the checkpoint write.
        if (i + 1) % checkpoint_every == 0:
            mu = truncate_lineage(mu, checkpoint_dir)
        if timers is None:
            alpha = e_step(mu, edges, skew_safe=skew_safe)
            mu = m_step(alpha, None, k, None, normalize=False)
        else:
            with timers.stage(ins.EM_ITER):
                alpha = ins.timed(timers, ins.E_STAGE, e_step(mu, edges, skew_safe=skew_safe))
                mu = ins.timed(
                    timers, ins.M_STAGE, m_step(alpha, None, k, None, normalize=False)
                )

    # one global rescale replaces the reference's per-iteration ones —
    # scale cancels inside the loop (see m_step docstring)
    mu = normalize_mu(mu)

    if calibrate_length_bias:
        mu = ins.timed(timers, ins.CAL_LENGTH, tare.calibrate_tx_len_bias(mu, t_len))

    return join_transcripts(transcripts, mu)
