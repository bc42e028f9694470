"""Hopping-window rollup (windows.hopping_rollup): hand-computed window
assignment, tumbling degenerate case, exact cents law, guards, and
DuckDB parity on real events (the oracle assigns windows via an
independent generate_series law, not a mirror of F.window)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.windows import hopping_rollup
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def _ev(spark, secs_vals):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), i % 3, "e", v, "{}")
            for i, (s, v) in enumerate(secs_vals)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_hand_computed_assignment(spark):
    # width 60, slide 30: event at t=70 -> windows starting 30 and 60;
    # event at t=10 -> windows starting -30? no: aligned windows 0 and -30;
    # Spark emits the -30 window too — pin the positive-era behavior with
    # events at 70 only
    ev = _ev(spark, [(70, 1.0)])
    rows = {
        r.window_start_us: r for r in hopping_rollup(ev, 60, 30, value_col="value").collect()
    }
    base_us = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert set(rows) == {base_us + 30_000_000, base_us + 60_000_000}
    for r in rows.values():
        assert r.n_events == 1 and r.value_cents == 100
        assert r.window_end_us - r.window_start_us == 60_000_000


def test_tumbling_degenerate_and_overlap_counts(spark):
    # width == slide: each event in exactly one window
    ev = _ev(spark, [(5, 1.0), (35, 2.0), (65, 4.0)])
    rows = hopping_rollup(ev, 30, 30, value_col="value").collect()
    assert len(rows) == 3 and all(r.n_events == 1 for r in rows)
    # width 90 slide 30: every event lands in exactly 3 windows
    rows3 = hopping_rollup(ev, 90, 30).collect()
    assert sum(r.n_events for r in rows3) == 9


def test_cents_snap_is_exact(spark):
    # the SHARED cents law floor(v·100 + 0.5): halves round UP for both
    # signs (floor(11.5+0.5)=12, floor(12.5+0.5)=13, floor(-12.5+0.5)=-12)
    ev = _ev(spark, [(10, 0.115), (10, 0.125), (10, -0.125)])
    rows = hopping_rollup(ev, 60, 60, value_col="value").collect()
    assert rows[0].value_cents == 12 + 13 - 12


def test_guards(spark):
    ev = _ev(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        hopping_rollup(ev, 0, 1)
    with pytest.raises(ValueError):
        hopping_rollup(ev, 60, 45)  # not aligned


def test_parity_with_duckdb_on_events(spark):
    from etl_scripts_spark.catalog import normalize_events

    ev = normalize_events(spark.read.parquet(f"{SF_SMALL}/events.parquet"))
    got = hopping_rollup(
        ev, 3600, 900, key_col="event_type", value_col="value"
    ).toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.hopping_rollup_sql(
            "SELECT ts, event_type, value FROM events",
            3600,
            900,
            key="event_type",
            value="value",
        )
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []
