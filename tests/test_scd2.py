"""SCD type-2 history maintenance (sinks/merge.py scd2_apply /
scd2_snapshot): close-and-open on change, no-op on unchanged attrs
(idempotency), stale-update drop, last-writer-wins within a batch,
closed-history passthrough, and point-in-time snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.sinks.merge import scd2_apply, scd2_snapshot

HIST_SCHEMA = "k string, color string, size bigint, valid_from bigint, valid_to bigint"
UPD_SCHEMA = "k string, color string, size bigint, effective_ts bigint"


def _hist(spark, rows):
    return spark.createDataFrame(rows, HIST_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, UPD_SCHEMA)


def _apply(hist, upd):
    return scd2_apply(hist, upd, keys=["k"], attrs=["color", "size"])


def _rows(df):
    # None sorts before any value; avoids None-vs-str TypeError
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_change_closes_and_opens(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 200)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "blue", 1, 200, None),
        ("a", "red", 1, 100, 200),
    ]


def test_unchanged_attrs_noop_and_idempotent(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "red", 1, 200)])
    once = _apply(hist, upd)
    assert _rows(once) == [("a", "red", 1, 100, None)]
    assert _rows(_apply(once, upd)) == _rows(once)


def test_new_key_opens_row(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("b", "green", 7, 150)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "red", 1, 100, None),
        ("b", "green", 7, 150, None),
    ]


def test_stale_update_dropped(spark):
    """effective_ts at/before the current row's valid_from is stale —
    dropped, never creating a zero-or-negative-length interval."""
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 100), ("a", "green", 1, 50)])
    assert _rows(_apply(hist, upd)) == [("a", "red", 1, 100, None)]


def test_last_writer_wins_within_batch(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 200), ("a", "green", 1, 300)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "green", 1, 300, None),
        ("a", "red", 1, 100, 300),
    ]


def test_closed_history_passes_through_untouched(spark):
    hist = _hist(
        spark,
        [("a", "red", 1, 100, 200), ("a", "blue", 1, 200, None)],
    )
    upd = _upd(spark, [("a", "gold", 2, 400)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "blue", 1, 200, 400),
        ("a", "gold", 2, 400, None),
        ("a", "red", 1, 100, 200),
    ]


def test_null_attr_transitions(spark):
    """eqNullSafe: NULL→NULL is 'unchanged'; NULL→value is a change."""
    hist = _hist(spark, [("a", None, 1, 100, None), ("b", None, 2, 100, None)])
    upd = _upd(spark, [("a", None, 1, 200), ("b", "set", 2, 200)])
    assert _rows(_apply(hist, upd)) == [
        ("a", None, 1, 100, None),
        ("b", None, 2, 100, 200),
        ("b", "set", 2, 200, None),
    ]


def test_snapshot_point_in_time(spark):
    hist = _hist(
        spark,
        [
            ("a", "red", 1, 100, 200),
            ("a", "blue", 1, 200, None),
            ("b", "green", 7, 150, None),
        ],
    )
    assert _rows(scd2_snapshot(hist, 150)) == [
        ("a", "red", 1, 100, 200),
        ("b", "green", 7, 150, None),
    ]
    assert _rows(scd2_snapshot(hist, 200)) == [
        ("a", "blue", 1, 200, None),
        ("b", "green", 7, 150, None),
    ]
    assert _rows(scd2_snapshot(hist, 99)) == []


def test_partitioning_independent(spark):
    hist = _hist(
        spark,
        [(f"k{i}", "red", i, 100, None) for i in range(40)],
    )
    upd = _upd(spark, [(f"k{i}", "blue", i, 200) for i in range(0, 40, 2)])
    a = _rows(_apply(hist.repartition(11), upd.repartition(5)))
    b = _rows(_apply(hist.coalesce(1), upd.coalesce(1)))
    assert a == b and len(a) == 60  # 40 survivors/opens + 20 closed
