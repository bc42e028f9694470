"""Multi-touch attribution (reports.attribution.attribute_conversions):
hand-computed windows, exact ppm-weight completion, tie determinism,
guards, and DuckDB parity on the real events table (the oracle is the
direct range-join formulation — no interval binning to hide in)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.reports.attribution import attribute_conversions
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=s), uid, et, 0.0, "{}")
            for (eid, s, uid, et) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_hand_computed_window_and_flags(spark):
    # user 1: clicks at t=10, 20; view at 30; purchase at 100 (lookback 60s
    # -> window [40, 100]: only the view at 30? no — 30 < 40, excluded;
    # make it concrete: touches at 50, 70; stale touch at 30)
    ev = _ev(spark, [
        (1, 30, 1, "click"),   # outside [40, 100]
        (2, 50, 1, "click"),
        (3, 70, 1, "view"),
        (4, 100, 1, "purchase"),
        (5, 95, 2, "click"),   # other user: not attributed to user 1
    ])
    rows = attribute_conversions(ev, lookback_s=60).collect()
    assert {r.touch_id for r in rows} == {2, 3}
    byid = {r.touch_id: r for r in rows}
    assert byid[2].is_first and not byid[2].is_last and byid[2].touch_rank == 1
    assert byid[3].is_last and not byid[3].is_first and byid[3].touch_rank == 2
    assert all(r.conv_id == 4 and r.n_touches == 2 for r in rows)
    assert byid[2].weight_ppm == byid[3].weight_ppm == 500_000


def test_weights_sum_to_exactly_one_million(spark):
    # 3 touches: 1e6 DIV 3 = 333333 rem 1 -> earliest touch gets the unit
    ev = _ev(spark, [
        (1, 10, 1, "click"), (2, 20, 1, "click"), (3, 30, 1, "view"),
        (4, 40, 1, "purchase"),
    ])
    rows = sorted(attribute_conversions(ev, lookback_s=60).collect(),
                  key=lambda r: r.touch_rank)
    assert [r.weight_ppm for r in rows] == [333334, 333333, 333333]
    assert sum(r.weight_ppm for r in rows) == 1_000_000


def test_boundary_inclusive_and_no_touch_conversion_absent(spark):
    ev = _ev(spark, [
        (1, 40, 1, "click"),    # exactly at window start (100 - 60)
        (2, 100, 1, "purchase"),
        (3, 500, 2, "purchase"),  # no touches at all
    ])
    rows = attribute_conversions(ev, lookback_s=60).collect()
    assert len(rows) == 1 and rows[0].touch_id == 1 and rows[0].conv_id == 2


def test_touch_tie_determinism(spark):
    # two touches at the SAME timestamp: rank by touch_id
    ev = _ev(spark, [
        (7, 50, 1, "click"), (5, 50, 1, "view"), (9, 60, 1, "purchase"),
    ])
    rows = sorted(attribute_conversions(ev, lookback_s=60).collect(),
                  key=lambda r: r.touch_rank)
    assert [r.touch_id for r in rows] == [5, 7]


def test_guards(spark):
    ev = _ev(spark, [(1, 10, 1, "click")])
    with pytest.raises(ValueError):
        attribute_conversions(ev, lookback_s=0)
    with pytest.raises(ValueError):
        attribute_conversions(ev, touch_types=())


def test_parity_with_duckdb_on_events(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from etl_scripts_spark.catalog import normalize_events

    ev = normalize_events(ev)
    got = (
        attribute_conversions(ev, lookback_s=3600)
        .withColumn("is_first", F.col("is_first").cast("int"))
        .withColumn("is_last", F.col("is_last").cast("int"))
        .toPandas()
    )
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        "SELECT * EXCLUDE (is_first, is_last), is_first::INT AS is_first, "
        "is_last::INT AS is_last FROM ("
        + oracle.attribute_conversions_sql(
            "SELECT event_id, ts, user_id, event_type FROM events",
            lookback_s=3600,
        )
        + ")"
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []
