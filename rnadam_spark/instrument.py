"""Named per-stage wall-clock timers — the reference's instrumentation
surface re-expressed for DataFrames.

The reference ships 29 named timers covering every pipeline stage
(rice-core/.../Timers.scala:28-62, wired via ``.instrument()`` at
cli/Index.scala:68); BASELINE.md calls for the bench to emit per-stage
timings mirroring those names so stage-level regressions are
attributable. Spark SQL is lazy, so stage attribution requires forcing
each stage's plan: when a ``StageTimers`` is passed, each stage is
cached and materialized (noop sink — full computation, no driver
collect) under its timer, and downstream stages reuse the cache, so
each number is the stage's *marginal* cost. With ``timers=None`` the
pipelines stay fully lazy — zero production overhead.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Stage names, verbatim from Timers.scala:28-62
EXTRACT = "Extracting Transcript from Reference"
SPLIT_KMERS = "Splitting k-mers from Transcript"
GENERATE_CLASSES = "Generating Equivalence Classes"
GENERATE_INDICES = "Mapping Equivalence Classes to Indices"
EXTRACT_LENGTHS = "Extraction Transcript Lengths"
COUNT_KMERS = "Counting k-mers"
TARE_KMERS = "Calibrate k-mer counts vs. GC Content"
COUNT_CLASSES = "Map k-mers to Equivalence Classes"
NORMALIZING = "Normalizing Input Counts"
INIT_EM = "Initializing EM Algorithm"
EM_ITER = "Running an Iteration of EM"
E_STAGE = "E stage of EM"
M_STAGE = "M stage of EM"
CAL_LENGTH = "Calibrating vs. Transcript Length"
JOIN_TRANSCRIPTS = "Joining vs. Transcripts"


class StageTimers:
    """Accumulating named wall-clock timers; repeated stages (the EM
    loop) add up, as the reference's Metrics timers do."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0)

    def as_dict(self, digits: int = 3) -> dict[str, float]:
        return {k: round(v, digits) for k, v in self.stages.items()}


def force(df: DataFrame) -> None:
    """Materialize end-to-end without a driver collect."""
    df.write.format("noop").mode("overwrite").save()


def timed(timers: StageTimers | None, name: str, df: DataFrame) -> DataFrame:
    """Under instrumentation: materialize ``df`` under ``name``'s timer
    via ``localCheckpoint(eager=True)`` and return the checkpointed
    frame — downstream stages read the stored partitions, so each
    number is that stage's marginal cost. Checkpoint (not cache) on
    purpose: caching keeps the full child plan inside every
    InMemoryRelation, and across an iterative loop the nested plan
    strings grow multiplicatively (observed: 16 GB OOM in
    generateTreeString by EM iteration 3); the checkpoint truncates
    lineage outright. Without timers: identity, fully lazy."""
    if timers is None:
        return df
    with timers.stage(name):
        df = df.localCheckpoint(eager=True)
    return df
