"""Lineage truncation for iterative loops (EM, CC, PageRank).

Iterative DataFrame loops grow their logical plan linearly with
iteration count — the reference's EM loop had the same hazard in RDD
form (rice-core/.../algorithms/Quantify.scala:105-114, never
truncated). Truncation choices:

- ``localCheckpoint`` (default): stores the materialized blocks on
  executors. Negligible cost, but NOT fault-tolerant — losing an
  executor mid-loop loses blocks with no recompute path (the lineage
  was just severed). Right call single-node and for short loops.
- reliable ``checkpoint`` (``checkpoint_dir`` set): writes the state to
  a fault-tolerant filesystem (HDFS/object store) so a lost executor
  re-reads instead of failing the job. Costs a write+read of the state
  per truncation — trivial for the tiny per-transcript µ table, worth
  it for hour-long jobs on preemptible nodes. This is the 100 TB form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint`` when ``checkpoint_dir``
    is None, reliable ``checkpoint`` into that directory otherwise.
    Eager by default — loop callers rely on the materialization
    happening here, once, instead of per downstream broadcast.

    ``eager=False`` (r14) defers materialization to the CALLER's next
    action over the returned frame — for loops whose round already ends
    with an action (the CC fixpoint probe), the lazy form fuses the
    truncation into that action: one job per round instead of an eager
    count plus the probe. The caller MUST run exactly one action on the
    result before deriving multiple consumers from it, or the unpersist-
    ed subtree recomputes per consumer — the hazard the eager default
    exists to prevent."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir is engine-global; re-setting to the same path is
    # a no-op, and differing paths follow the most recent caller
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
