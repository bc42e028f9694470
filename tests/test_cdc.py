"""Change data feed (sinks/cdc.py): snapshot diff classification,
null-attr transitions, loud duplicate-/null-key guards, feed→replay
round-trip, the commit-chain end-to-end path, and DuckDB oracle parity
(oracle.table_changes_sql)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.sinks.cdc import snapshot_changes, table_changes
from etl_scripts_spark.sinks.commit import try_publish_version

SCHEMA = "k string, color string, size bigint"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_classifies_insert_delete_update(spark):
    old = _df(spark, [("a", "red", 1), ("b", "blue", 2), ("c", "green", 3)])
    new = _df(spark, [("a", "red", 1), ("b", "blue", 9), ("d", "black", 4)])
    got = _rows(snapshot_changes(old, new, ["k"]))
    assert got == sorted(
        [
            ("b", "blue", 2, "update_preimage"),
            ("b", "blue", 9, "update_postimage"),
            ("c", "green", 3, "delete"),
            ("d", "black", 4, "insert"),
        ],
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_null_attr_transitions(spark):
    # null -> value and value -> null are updates; null == null is unchanged
    old = _df(spark, [("a", None, 1), ("b", "x", None), ("c", None, None)])
    new = _df(spark, [("a", "set", 1), ("b", "x", 5), ("c", None, None)])
    got = _rows(snapshot_changes(old, new, ["k"]))
    kinds = sorted((r[0], r[-1]) for r in got)
    assert kinds == [
        ("a", "update_postimage"),
        ("a", "update_preimage"),
        ("b", "update_postimage"),
        ("b", "update_preimage"),
    ]


def test_empty_old_is_all_inserts(spark):
    new = _df(spark, [("a", "red", 1), ("b", "blue", 2)])
    got = snapshot_changes(None, new, ["k"])
    assert {r["_change_type"] for r in got.collect()} == {"insert"}
    assert got.count() == 2


def test_key_only_table_is_presence_diff(spark):
    old = spark.createDataFrame([("a",), ("b",)], "k string")
    new = spark.createDataFrame([("b",), ("c",)], "k string")
    got = _rows(snapshot_changes(old, new, ["k"]))
    assert got == [("a", "delete"), ("c", "insert")]


def test_duplicate_key_raises(spark):
    old = _df(spark, [("a", "red", 1)])
    new = _df(spark, [("a", "red", 1), ("a", "blue", 2)])
    with pytest.raises(Exception, match="duplicate or NULL key"):
        snapshot_changes(old, new, ["k"]).collect()


def test_null_key_raises(spark):
    old = _df(spark, [("a", "red", 1)])
    new = _df(spark, [(None, "red", 1)])
    with pytest.raises(Exception, match="duplicate or NULL key"):
        snapshot_changes(old, new, ["k"]).collect()


def test_from_empty_still_guards_keys(spark):
    # old=None must enforce the same key contract: a dup/NULL key replayed
    # from the all-insert feed would build a table violating uniqueness
    dup = _df(spark, [("a", "red", 1), ("a", "blue", 2)])
    with pytest.raises(Exception, match="duplicate or NULL key"):
        snapshot_changes(None, dup, ["k"]).collect()
    nul = _df(spark, [(None, "red", 1)])
    with pytest.raises(Exception, match="duplicate or NULL key"):
        snapshot_changes(None, nul, ["k"]).collect()


def test_internal_name_collision_raises(spark):
    bad = spark.createDataFrame([(1, 1)], "_o bigint, v bigint")
    with pytest.raises(ValueError, match="collide with internals"):
        snapshot_changes(bad, bad, ["_o"])


def test_prefixed_internal_name_collision_raises(spark):
    """A column already named like another's _o_/_n_ projection alias
    (key `_o_x` beside attr `x`) used to duplicate a name inside the o/n
    projections and die later as an opaque ambiguous-reference
    AnalysisException — it must raise the named guard instead."""
    bad = spark.createDataFrame([(1, 2)], "_o_x bigint, x bigint")
    with pytest.raises(ValueError, match="collide with internals"):
        snapshot_changes(bad, bad, ["_o_x"])
    with pytest.raises(ValueError, match="collide with internals"):
        snapshot_changes(None, bad, ["_o_x"])


def test_schema_mismatch_raises(spark):
    old = _df(spark, [("a", "red", 1)])
    new = spark.createDataFrame([("a", "red")], "k string, color string")
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_changes(old, new, ["k"])


def test_feed_replays_old_into_new(spark):
    """Semantic law: old + feed == new.  Drop deleted/pre-image keys,
    union inserts + post-images."""
    old = _df(spark, [("a", "red", 1), ("b", "blue", 2), ("c", "green", 3)])
    new = _df(spark, [("a", "red", 1), ("b", "navy", 2), ("d", "black", 4)])
    feed = snapshot_changes(old, new, ["k"])
    gone = feed.filter(F.col("_change_type").isin("delete", "update_preimage"))
    add = feed.filter(F.col("_change_type").isin("insert", "update_postimage"))
    replay = old.join(gone.select("k"), "k", "left_anti").unionByName(
        add.drop("_change_type")
    )
    assert _rows(replay) == _rows(new)


def test_single_join_two_exchanges(spark):
    """The duplicate-key window rides the join's own hash exchange —
    exactly one full-outer join, exactly two shuffles (one per side)."""
    old = _df(spark, [("a", "red", 1)])
    new = _df(spark, [("a", "red", 2)])
    plan = snapshot_changes(old, new, ["k"])._jdf.queryExecution().simpleString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert plan.count("Exchange") == 2


def _publish(tmp_path, spark, version, rows):
    data = os.path.join(tmp_path, f"data_v{version}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(data)
    assert try_publish_version(str(tmp_path), version, data)
    return data


def test_table_changes_end_to_end(spark, tmp_path):
    root = str(tmp_path)
    _publish(root, spark, 1, [("a", "red", 1), ("b", "blue", 2)])
    _publish(root, spark, 2, [("a", "red", 1), ("b", "navy", 2), ("c", "green", 3)])
    feed = table_changes(spark, root, ["k"], v_from=1)  # v_to defaults to latest
    rows = _rows(feed)
    assert all(r[-2] == 1 and r[-1] == 2 for r in rows)  # _from_version, _commit_version
    assert sorted(r[3] for r in rows) == [
        "insert",
        "update_postimage",
        "update_preimage",
    ]
    # from-empty: the whole v2 snapshot arrives as inserts
    full = table_changes(spark, root, ["k"], v_from=0, v_to=2)
    assert {r["_change_type"] for r in full.collect()} == {"insert"}
    assert full.count() == 3
    with pytest.raises(ValueError, match="past"):
        table_changes(spark, root, ["k"], v_from=2, v_to=1)


def test_oracle_parity_randomized(spark):
    """oracle.table_changes_sql recomputes the feed bit-for-bit on a
    seeded diff with inserts, deletes, attr updates, and null churn."""
    import random

    import duckdb
    import pandas as pd

    from tests.parity import compare

    rng = random.Random(71)
    colors = ["red", "blue", None, "green"]
    old = [(f"k{i}", rng.choice(colors), rng.choice([1, 2, None])) for i in range(40)]
    new = []
    for k, c, s in old:
        r = rng.random()
        if r < 0.25:
            continue  # delete
        if r < 0.55:
            new.append((k, rng.choice(colors), rng.choice([1, 2, 3, None])))
        else:
            new.append((k, c, s))  # unchanged
    new += [(f"n{i}", rng.choice(colors), i) for i in range(7)]  # inserts

    feed = snapshot_changes(_df(spark, old), _df(spark, new), ["k"])
    spark_pdf = feed.toPandas()

    con = duckdb.connect()
    con.register("old_t", pd.DataFrame(old, columns=["k", "color", "size"]))
    con.register("new_t", pd.DataFrame(new, columns=["k", "color", "size"]))
    sql = oracle.table_changes_sql(
        "SELECT * FROM old_t", "SELECT * FROM new_t", ["k"], ["color", "size"]
    )
    oracle_pdf = con.execute(sql).fetchdf()
    # duckdb returns size as float64 when NULLs present via pandas; align
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
