"""Streaming hopping rollup == batch hopping rollup, row-for-row — the
verification law every streaming operator in this repo follows."""

from __future__ import annotations

import pytest

from etl_scripts_spark.catalog import normalize_events
from etl_scripts_spark.operators.windows import hopping_rollup
from etl_scripts_spark.streaming.windowed import hopping_counts_available_now
from tests.conftest import SF_SMALL


def test_streaming_drain_equals_batch(spark):
    got = hopping_counts_available_now(
        spark, f"{SF_SMALL}/events.parquet", width_s=3600, slide_s=900
    )
    want = hopping_rollup(
        normalize_events(spark.read.parquet(f"{SF_SMALL}/events.parquet")),
        3600,
        900,
        key_col="event_type",
        value_col="value",
    )
    key = ["window_start_us", "window_end_us", "event_type"]
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.select(*key, "n_events", "value_cents").collect())
    assert len(g) > 0
    assert g == w


def test_streaming_guard(spark):
    with pytest.raises(ValueError):
        hopping_counts_available_now(
            spark, f"{SF_SMALL}/events.parquet", width_s=60, slide_s=45
        )
