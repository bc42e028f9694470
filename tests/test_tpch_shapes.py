"""TPC-H Q17/Q22 rewrite shapes (reports/tpch.py): the explicit
decorrelated Spark plans match the TEXTBOOK correlated SQL forms in
DuckDB on the real testdata tables, and the plans carry the promised
join strategies (broadcast dim, anti join, no correlated re-scan)."""

from __future__ import annotations

import contextlib
import io

from etl_scripts_spark.reports.tpch import (
    q17_oracle_sql,
    q17_small_quantity_revenue,
    q22_idle_balances,
    q22_oracle_sql,
)
from tests.parity import compare, duckdb_con

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_q17_matches_textbook_correlated_form(spark):
    got = q17_small_quantity_revenue(_t(spark, "lineitem"), _t(spark, "part")).toPandas()
    want = duckdb_con(SF).execute(q17_oracle_sql()).fetchdf()
    assert compare(got, want) == []


def test_q22_matches_textbook_form(spark):
    got = q22_idle_balances(_t(spark, "customer"), _t(spark, "orders")).toPandas()
    want = duckdb_con(SF).execute(q22_oracle_sql()).fetchdf()
    assert len(got) > 0
    assert compare(got, want) == []


def test_q17_plan_shape(spark):
    """Brand dim broadcasts; the per-part average is ONE aggregate joined
    back — never a correlated per-row re-scan (no nested loop)."""
    df = q17_small_quantity_revenue(_t(spark, "lineitem"), _t(spark, "part"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan, marker


def test_q22_plan_shape(spark):
    """NOT EXISTS compiles to an anti join; the threshold is a 1-row
    broadcast attach (the declared BNLJ shape), not a re-aggregation."""
    df = q22_idle_balances(_t(spark, "customer"), _t(spark, "orders"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LeftAnti" in plan, plan[:400]
