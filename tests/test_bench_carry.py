"""Carry-forward discipline for bench.py's cross-decade rows.

r10 ADVICE: once a row's previous sf1+sf10 estimate exceeded the budget
it was carried forward on EVERY run and never re-measured — perf changes
(e.g. a 3.3x repetition_stats speedup) would never reach the artifact.
The fix caps consecutive carries: after max_carries the row is force-
remeasured (at most one forced row per run bounds the overshoot)."""

from bench import _carry_decision


def test_under_budget_always_measures():
    assert _carry_decision(None, False, False, 2) == ("measure", None)
    assert _carry_decision({"carries": 99}, False, False, 2) == ("measure", None)


def test_over_budget_without_history_skips():
    assert _carry_decision(None, True, False, 2) == ("skip", None)


def test_first_carries_annotate_and_count():
    prev = {"sf1_sec": 47.0, "sf10_sec": 118.0, "slope_per_decade": 2.52}
    decision, row = _carry_decision(prev, True, False, 2)
    assert decision == "carry"
    assert row["carried_from_previous"] is True and row["carries"] == 1
    decision, row = _carry_decision(row, True, False, 2)
    assert decision == "carry" and row["carries"] == 2
    # timing fields ride along unchanged
    assert row["sf1_sec"] == 47.0 and row["sf10_sec"] == 118.0


def test_carry_cap_forces_remeasure():
    stale = {"sf1_sec": 47.0, "sf10_sec": 118.0, "carries": 2,
             "carried_from_previous": True}
    assert _carry_decision(stale, True, False, 2) == ("force", None)


def test_only_one_forced_row_per_run():
    # a second at-cap row in the same run keeps carrying (counter ticks)
    stale = {"sf1_sec": 1.0, "sf10_sec": 2.0, "carries": 5}
    decision, row = _carry_decision(stale, True, True, 2)
    assert decision == "carry" and row["carries"] == 6


def test_fresh_measure_resets_the_counter():
    # a re-measured row writes no carry keys, so the NEXT carry is 1
    fresh = {"sf1_sec": 3.0, "sf10_sec": 9.0, "slope_per_decade": 3.0}
    decision, row = _carry_decision(fresh, True, False, 2)
    assert decision == "carry" and row["carries"] == 1


def test_legacy_carried_rows_start_at_one():
    # rows carried by the pre-counter code have the flag but no counter
    # — they are the stalest rows and must not restart the clock at 0
    legacy = {"sf1_sec": 47.0, "sf10_sec": 118.0, "carried_from_previous": True}
    decision, row = _carry_decision(legacy, True, False, 2)
    assert decision == "carry" and row["carries"] == 2
    assert _carry_decision(row, True, False, 2) == ("force", None)


def test_error_rows_are_not_history():
    # r11 ADVICE: a previous {"error": ...} row carried as
    # carried_from_previous re-presents a stale error as a timing
    # artifact; timing-less rows must be treated as no-history (skip)
    assert _carry_decision({"error": "boom"}, True, False, 2) == ("skip", None)
    assert _carry_decision({"sf1_sec": 1.0}, True, False, 2) == ("skip", None)
    # under budget an errored history still re-measures
    assert _carry_decision({"error": "boom"}, False, False, 2) == ("measure", None)
