"""exact_percentiles (windows.py) + pivot/unpivot (reshape.py): explicit
integer-rank law vs the float-boundary trap, grouped/global agreement,
DuckDB parity (explicit law AND native quantile_disc off-boundary),
pivot CASE-law parity, unpivot round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.reshape import pivot_table, unpivot_table
from etl_scripts_spark.operators.windows import exact_percentiles
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def test_percentile_law_avoids_float_boundary(spark):
    """n=100, pct=7: ceil(0.07·100) computed in floats is ceil(7.0000…01)
    = 8; the exact integer law lands on rank 7."""
    df = spark.range(1, 101).select(F.col("id").alias("x"))
    got = {r.pct: r.value for r in exact_percentiles(df, "x", (7, 50, 100)).collect()}
    assert got == {7: 7, 50: 50, 100: 100}


def test_percentile_grouped_matches_global_on_one_group(spark):
    df = spark.range(1, 51).select(F.lit("g").alias("g"), F.col("id").alias("x"))
    glob = {r.pct: r.value for r in exact_percentiles(df, "x", (30, 60)).collect()}
    grp = {
        r.pct: r.value
        for r in exact_percentiles(df, "x", (30, 60), by="g").collect()
    }
    assert glob == grp == {30: 15, 60: 30}


def test_percentile_nulls_drop_and_ties_ok(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (5,), (5,), (9,)], "x int"
    )
    got = {r.pct: r.value for r in exact_percentiles(df, "x", (50, 100)).collect()}
    assert got == {50: 5, 100: 9}


def test_percentile_pct_bounds(spark):
    df = spark.range(3).select(F.col("id").alias("x"))
    for bad in (0, 101, 2.5):
        with pytest.raises(ValueError, match="pcts must be"):
            exact_percentiles(df, "x", (bad,))


def test_percentile_parity_with_duckdb(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = exact_percentiles(li, "l_extendedprice", (25, 50, 75, 99), by="l_returnflag").toPandas()
    want = duckdb_con(SF_SMALL).execute(
        oracle.exact_percentiles_sql(
            "SELECT * FROM lineitem", "l_extendedprice", (25, 50, 75, 99), by="l_returnflag"
        )
    ).fetchdf()
    assert len(got) == 12
    assert compare(got, want) == []


def test_percentile_crosschecks_native_quantile_disc(spark):
    """GENUINELY off the boundary — restrict lineitem so n is not a
    multiple of 100 (pct·n never lands on an integer) — the explicit law
    and DuckDB's native quantile_disc must agree: the independent check
    that our law IS percentile_disc."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").filter(
        F.col("l_orderkey") % 7 == 3
    )
    n = li.count()
    assert n % 100 != 0 and (37 * n) % 100 != 0, n  # the premise, pinned
    got = {
        r.pct: r.value
        for r in exact_percentiles(li, "l_extendedprice", (37, 61)).collect()
    }
    con = duckdb_con(SF_SMALL)
    for pct in (37, 61):
        want = con.execute(
            f"SELECT quantile_disc(l_extendedprice, {pct / 100}) FROM lineitem "
            "WHERE l_orderkey % 7 = 3"
        ).fetchone()[0]
        assert got[pct] == want, pct


def test_pivot_counts_and_sums(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 2), ("a", "y", 4), ("b", "y", 8), ("b", "z", 16)],
        "g string, p string, v int",
    )
    got = pivot_table(df, "g", "p", ["x", "y"]).orderBy("g").collect()
    assert [(r.g, r.x, r.y) for r in got] == [("a", 2, 1), ("b", 0, 1)]
    got = pivot_table(df, "g", "p", ["x", "y"], agg_col="v").orderBy("g").collect()
    assert [(r.g, r.x, r.y) for r in got] == [("a", 3, 4), ("b", 0, 8)]


def test_pivot_guards(spark):
    df = spark.createDataFrame([("a", "x", 1.5)], "g string, p string, v double")
    with pytest.raises(ValueError, match="non-empty"):
        pivot_table(df, "g", "p", [])
    with pytest.raises(ValueError, match="unique"):
        pivot_table(df, "g", "p", ["x", "x"])
    with pytest.raises(ValueError, match="reduction-tree"):
        pivot_table(df, "g", "p", ["x"], agg_col="v")


def test_pivot_parity_with_duckdb(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    values = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    got = pivot_table(orders, "o_orderstatus", "o_orderpriority", values).toPandas()
    want = duckdb_con(SF_SMALL).execute(
        oracle.pivot_table_sql(
            "SELECT * FROM orders", "o_orderstatus", "o_orderpriority", values
        )
    ).fetchdf()
    assert len(got) > 1
    assert compare(got, want) == []


def test_unpivot_round_trip(spark):
    df = spark.createDataFrame(
        [("a", 1, 2), ("b", 3, None)], "id string, m1 int, m2 int"
    )
    melted = unpivot_table(df, ["id"], ["m1", "m2"], "metric", "val")
    rows = {(r.id, r.metric): r.val for r in melted.collect()}
    assert rows == {("a", "m1"): 1, ("a", "m2"): 2, ("b", "m1"): 3, ("b", "m2"): None}
    # pivot the melt back: counts of non-null cells match the wide shape
    back = pivot_table(
        melted.filter(F.col("val").isNotNull()), "id", "metric", ["m1", "m2"], agg_col="val"
    ).orderBy("id").collect()
    assert [(r.id, r.m1, r.m2) for r in back] == [("a", 1, 2), ("b", 3, 0)]


def test_unpivot_is_map_only(spark):
    from tests.parity import plan_of

    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    plan = plan_of(unpivot_table(df, ["o_orderkey"], ["o_totalprice"], "m", "v"))
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_percentile_null_group_key_survives(spark):
    """A NULL `by` key is a real partition (the oracle keeps it); the
    window-count formulation must not drop it the way an equi-join
    would."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 5)], "g string, x int"
    )
    got = {(r.g, r.pct): r.value for r in exact_percentiles(df, "x", (50,), by="g").collect()}
    assert got == {(None, 50): 1, ("a", 50): 5}


def test_percentile_empty_pcts_raises(spark):
    df = spark.range(3).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="non-empty"):
        exact_percentiles(df, "x", ())


def test_pivot_oracle_escapes_quotes():
    sql = oracle.pivot_table_sql("SELECT 1", "g", "p", ["O'HARE"])
    assert "'O''HARE'" in sql and "'O'HARE'" not in sql.replace("'O''HARE'", "")
