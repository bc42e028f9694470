"""Pre-staged registrations (__spark_entry__._STAGED — the r12+ banked
backlog; the seventeen r10 flips and ten r11 flips live in
queries()/oracle_sql() and are covered by tests/test_oracle_parity.py
now): every staged
query must already match its DuckDB oracle with the driver's own
strictness (tests/parity.compare — column-sorted, row-sorted, exact
values), so each future round's registration flip is pure plumbing with
no new verification risk.  Runs at sf0.001 (the driver_sim fast tier);
the sf0.01 sweep is run in-session before each staging commit."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con

STAGED = sorted(entrymod.staged_queries())


def test_every_staged_query_has_an_oracle():
    assert set(entrymod.staged_oracle_sql()) == set(entrymod.staged_queries())


def test_staged_names_do_not_shadow_registered():
    assert not set(entrymod.staged_queries()) & set(entrymod.queries())


@pytest.mark.parametrize("name", STAGED)
def test_staged_query_matches_oracle(spark, name):
    pdf = entrymod.staged_queries()[name](spark, SF_SMALL).toPandas()
    want = duckdb_con(SF_SMALL).execute(entrymod.staged_oracle_sql()[name]).fetchdf()
    problems = compare(pdf, want)
    assert problems == [], problems
    assert len(pdf) > 0, f"{name} returned no rows at sf0.001"


# --- plan audit: the registered-query scale contract, applied at staging
# time so a flip never imports a plan regression -------------------------

#: staged queries whose plans intentionally contain an Arrow-batched
#: Python stage (codec decode inside mapInPandas) — never BatchEvalPython.
STAGED_ARROW = {
    "q_g711_audio_stats",
    # (gif/tiff pixel stats flipped to the registered surface in r12 —
    # their Arrow declaration now lives in test_plans.py)
}

#: declared 1-row / small-broadcast nested-loop sites: corpus-stats
#: attaches (join_singleton) and the part×supplier-grid derived-partsupp
#: law (reports/tpch.partsupp_df — a broadcast of the 10·SF-row supplier
#: dim against part, the deterministic stand-in for the missing table).
STAGED_BNLJ: set[str] = {
    # (key_skew_report / stratified_sample flipped to the registered
    # surface in r12; the partsupp-grid TPC-H four in r11 — their BNLJ
    # declarations now live in test_plans.py)
}

#: Queries whose real work executes eagerly at call time, so there is no
#: lazy plan to audit (the oracle is the contract instead): the
#: AvailableNow streaming twins.  (The scratch-root MV drain and vacuum
#: chain flipped to the registered surface in r10 — their eager
#: exemption now lives in tests/test_plans.py.)
STAGED_EAGER = {
    "q_stream_rolling_zscore",
    "q_stream_hll",
}


@pytest.mark.parametrize("name", sorted(set(STAGED) - STAGED_EAGER))
def test_staged_plan_stays_on_the_scale_contract(spark, name):
    import contextlib
    import io

    df = entrymod.staged_queries()[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time UDF"
    if name not in STAGED_ARROW:
        for m in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert m not in plan, f"{name} has an undeclared Python stage ({m})"
    if name not in STAGED_BNLJ:
        for m in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert m not in plan, f"{name} has an undeclared cross join ({m})"
    assert "element_at(split(trim(regexp_replace" not in plan, (
        f"{name} inlines the tokenizer expression into a HOF lambda"
    )


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
