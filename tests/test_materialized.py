"""Incremental rollup maintenance (sinks/materialized.py): the refresh
law refresh(rollup(old), changes(old,new)) == rollup(new) on randomized
snapshots (including group-migration updates), group appear/disappear,
loud guards (negative count, unknown change type, NULL/float measures,
internal-name collisions), and DuckDB recompute parity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark.sinks.cdc import snapshot_changes
from etl_scripts_spark.sinks.materialized import refresh_rollup, rollup_table

SCHEMA = "k bigint, grp string, x bigint, y bigint"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _random_snaps(seed, n):
    """old/new row dicts keyed by k; new = old with updates (some moving
    groups), deletes, inserts."""
    rng = random.Random(seed)
    old = {
        k: (k, f"g{rng.randint(1, 6)}", rng.randint(-50, 50), rng.randint(0, 9))
        for k in range(n)
    }
    new = {}
    for k, row in old.items():
        r = rng.random()
        if r < 0.10:
            continue  # delete
        if r < 0.30:  # update; half the time migrate groups
            grp = f"g{rng.randint(1, 6)}" if r < 0.20 else row[1]
            new[k] = (k, grp, rng.randint(-50, 50), row[3])
        else:
            new[k] = row
    for k in range(n, n + n // 10):  # inserts
        new[k] = (k, f"g{rng.randint(1, 6)}", rng.randint(-50, 50), rng.randint(0, 9))
    return list(old.values()), list(new.values())


def test_refresh_law_randomized(spark):
    orows, nrows = _random_snaps(11, 400)
    old, new = _snap(spark, orows), _snap(spark, nrows)
    current = rollup_table(old, ["grp"], ["x", "y"])
    feed = snapshot_changes(old, new, ["k"])
    got = _rows(refresh_rollup(current, feed, ["grp"], ["x", "y"]))
    want = _rows(rollup_table(new, ["grp"], ["x", "y"]))
    assert got == want


def test_group_appears_and_disappears(spark):
    old = _snap(spark, [(1, "a", 5, 0), (2, "b", 7, 0)])
    new = _snap(spark, [(1, "a", 5, 0), (3, "c", 9, 0)])  # b gone, c new
    current = rollup_table(old, ["grp"], ["x"])
    got = _rows(refresh_rollup(current, snapshot_changes(old, new, ["k"]), ["grp"], ["x"]))
    assert got == [("a", 1, 5), ("c", 1, 9)]


def test_group_migration_update(spark):
    old = _snap(spark, [(1, "a", 5, 0)])
    new = _snap(spark, [(1, "b", 5, 0)])
    current = rollup_table(old, ["grp"], ["x"])
    got = _rows(refresh_rollup(current, snapshot_changes(old, new, ["k"]), ["grp"], ["x"]))
    assert got == [("b", 1, 5)]


def test_negative_count_raises(spark):
    old = _snap(spark, [(1, "a", 5, 0)])
    new = _snap(spark, [])
    feed = snapshot_changes(old, new, ["k"])
    empty_rollup = rollup_table(new, ["grp"], ["x"])
    with pytest.raises(Exception, match="negative"):
        refresh_rollup(empty_rollup, feed, ["grp"], ["x"]).collect()


def test_unknown_change_type_raises(spark):
    current = rollup_table(_snap(spark, [(1, "a", 5, 0)]), ["grp"], ["x"])
    feed = spark.createDataFrame(
        [("a", 5, "upsert")], "grp string, x bigint, _change_type string"
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        refresh_rollup(current, feed, ["grp"], ["x"]).collect()


def test_null_measure_raises(spark):
    base = spark.createDataFrame([("a", None)], "grp string, x bigint")
    with pytest.raises(Exception, match="NULL measure"):
        rollup_table(base, ["grp"], ["x"]).collect()


def test_float_measure_raises(spark):
    base = spark.createDataFrame([("a", 1.5)], "grp string, x double")
    with pytest.raises(ValueError, match="integer grid"):
        rollup_table(base, ["grp"], ["x"])
    # fractional-scale decimals would TRUNCATE in the decimal(38,0) path
    dec = spark.createDataFrame([("a",)], "grp string").select(
        "grp", F.lit(1).cast("decimal(10,2)").alias("x")
    )
    with pytest.raises(ValueError, match="integer grid"):
        rollup_table(dec, ["grp"], ["x"])


def test_null_group_key_refresh_law(spark):
    # groupBy puts NULL keys in ONE group; the refresh join must match
    # them too (eqNullSafe) — insert into and delete from a NULL group
    old = _snap(spark, [(1, None, 5, 0), (2, "b", 7, 0)])
    new = _snap(spark, [(1, None, 5, 0), (3, None, 2, 0)])  # ins NULL, del b
    current = rollup_table(old, ["grp"], ["x"])
    got = _rows(refresh_rollup(current, snapshot_changes(old, new, ["k"]), ["grp"], ["x"]))
    assert got == _rows(rollup_table(new, ["grp"], ["x"]))
    # and deleting the whole NULL group drops it without a spurious raise
    gone = _snap(spark, [(2, "b", 7, 0)])
    got2 = _rows(
        refresh_rollup(current, snapshot_changes(old, gone, ["k"]), ["grp"], ["x"])
    )
    assert got2 == _rows(rollup_table(gone, ["grp"], ["x"]))


def test_sum_overflow_is_loud(spark):
    # ANSI throws at the decimal op; non-ANSI would hit the in-plan raise —
    # either way a sum past bigint is never silently committed
    big = 2**62
    base = _snap(spark, [(1, "a", big, 0), (2, "a", big, 0), (3, "a", big, 0)])
    with pytest.raises(Exception, match="overflowed|cannot be represented|CAST_OVERFLOW|ARITHMETIC_OVERFLOW"):
        rollup_table(base, ["grp"], ["x"]).collect()


def test_internal_name_collision_raises(spark):
    base = spark.createDataFrame([("a", 1, 2)], "grp string, x bigint, _dn bigint")
    with pytest.raises(ValueError, match="internals"):
        rollup_table(base, ["grp"], ["x"])


def test_work_scales_with_changes_not_base(spark):
    # the deltas aggregate BEFORE the join: the plan joins |groups| rows
    # against |changed groups| rows — assert the aggregate sits below the join
    orows, nrows = _random_snaps(5, 300)
    old, new = _snap(spark, orows), _snap(spark, nrows)
    current = rollup_table(old, ["grp"], ["x"])
    out = refresh_rollup(current, snapshot_changes(old, new, ["k"]), ["grp"], ["x"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    join_pos = plan.find("SortMergeJoin FullOuter")
    if join_pos < 0:
        join_pos = plan.find("ShuffledHashJoin FullOuter")
    assert join_pos >= 0, plan
    assert "HashAggregate" in plan


def test_duckdb_recompute_parity(spark):
    import duckdb

    from tests.parity import compare

    orows, nrows = _random_snaps(21, 350)
    old, new = _snap(spark, orows), _snap(spark, nrows)
    current = rollup_table(old, ["grp"], ["x", "y"])
    spark_pdf = refresh_rollup(
        current, snapshot_changes(old, new, ["k"]), ["grp"], ["x", "y"]
    ).toPandas()
    vals = ", ".join(f"({k}, '{g}', {x}, {y})" for k, g, x, y in nrows)
    sql = f"""
SELECT grp, count(*) AS n, sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y
FROM (VALUES {vals}) t(k, grp, x, y) GROUP BY grp
"""
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
