"""The staged backlog (__spark_entry__._STAGED) drained in r13 — the
final 12-query heavy tail (hll_join_estimate, attribution, setsim pair +
feed, contamination_report, embedding_covariance, bfs_distances, k_core,
plan_compaction, stream_rolling_zscore, stream_hll, g711_audio_stats)
flipped to the registered surface, where tests/test_oracle_parity.py and
tests/test_plans.py now carry their verification (the per-query oracle
parity, plan audits, and allowlist declarations all moved there with the
flip).  This file keeps two things: the drain pin (an accidental future
`@_stage` without the COVERAGE.md flip plan re-opens a backlog the
rotation math no longer budgets for — that must be a loud, deliberate
step, not a drive-by), and the scratch-root wipe-survival property that
always lived here with its staged-era siblings."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def test_staged_backlog_is_drained():
    """r13 flipped the last 12 staged queries; a new @_stage entry means
    a new banking wave — update COVERAGE.md's registration queue with
    the flip round + window math FIRST, then replace this pin with the
    staged-parity harness from git history (tests/test_staged_r10.py
    pre-r13 had the full oracle/plan audit for staged entries)."""
    assert entrymod.staged_queries() == {}
    assert entrymod.staged_oracle_sql() == {}


def test_scratch_backed_result_survives_a_second_call(spark):
    """The scratch-root queries wipe their state per call; a result held
    across a later call must not dangle on deleted files (both return
    eagerly localCheckpointed frames).  q_stream_mv_drain registered in
    r10 but the wipe-survival property is pinned here with its scratch
    siblings."""
    mv = entrymod.queries()["q_stream_mv_drain"]
    first = mv(spark, SF_SMALL)
    second = mv(spark, SF_SMALL)  # wipes the first call's scratch root
    rows = sorted(tuple(r) for r in first.collect())
    assert rows == sorted(tuple(r) for r in second.collect())
    assert len(rows) > 0
