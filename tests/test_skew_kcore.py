"""Key-skew diagnosis report (skew.key_skew_report) and k-core
decomposition (graph.k_core): hand-computed laws, peel fixpoint
semantics, NULL handling, guards, and DuckDB parity for both."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.graph import k_core
from etl_scripts_spark.operators.skew import key_skew_report
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con, plan_of


def test_skew_report_hand_computed(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = {r.rank: r for r in key_skew_report(df, "k", top_k=2).collect()}
    assert got[1].key == "hot" and got[1].n == 60 and got[1].share_ppm == 600_000
    assert got[2].key == "warm" and got[2].share_ppm == 300_000
    assert len(got) == 2


def test_skew_report_null_key_counted_and_ties(spark):
    rows = [(None,)] * 5 + [("a",)] * 5 + [("b",)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, "k", top_k=3).collect()
    # tie between NULL and 'a' at n=5: asc_nulls_last puts 'a' first
    assert [r.key for r in got] == ["a", None, "b"]
    assert got[0].share_ppm == got[1].share_ppm == 416_666


def test_skew_report_plan_is_take_ordered(spark):
    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plan = plan_of(key_skew_report(df, "l_orderkey", top_k=10))
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        key_skew_report(df, "l_orderkey", top_k=0)


def test_skew_report_parity_with_duckdb(spark):
    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = key_skew_report(df, "l_suppkey", top_k=8).toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.key_skew_report_sql("SELECT l_suppkey FROM lineitem", "l_suppkey", 8)
    ).fetchdf()
    assert len(want) == 8
    assert compare(got, want) == []


# ------------------------------------------------------------ k-core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_hand_computed(spark):
    # triangle 1-2-3 (a 2-core) with pendant chain 3-4-5 (peels away)
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    got = {r.node: r.degree for r in k_core(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_peel(spark):
    # chain 1-2-3-4: inner nodes have degree 2 initially, but peeling the
    # ends cascades until nothing is left — the fixpoint, not one pass
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert k_core(e, k=2).count() == 0


def test_kcore_canonicalization(spark):
    # self-loops, duplicates, and reversed duplicates must count once
    e = _edges(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (3, 1)])
    got = {r.node: r.degree for r in k_core(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_k1_and_guards(spark):
    e = _edges(spark, [(1, 2), (3, 4)])
    assert {r.node for r in k_core(e, k=1).collect()} == {1, 2, 3, 4}
    with pytest.raises(ValueError):
        k_core(e, k=0)
    # NULL endpoints dropped
    en = spark.createDataFrame([(1, 2), (2, None), (1, 2)], "src long, dst long")
    assert k_core(en, k=1).count() == 2


def test_kcore_oracle_guards_nonconvergence(spark):
    """A too-small `rounds` must ERROR in the oracle, never bless a
    non-converged superset as truth (mirrors the Spark op's raise)."""
    import duckdb

    vals = ", ".join(f"({i}, {i + 1})" for i in range(30))  # peel depth 15
    con = duckdb.connect()
    with pytest.raises(Exception, match="not converged"):
        con.execute(
            oracle.k_core_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)", k=2, rounds=8)
        ).fetchdf()
    ok = con.execute(
        oracle.k_core_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)", k=2, rounds=16)
    ).fetchdf()
    assert len(ok) == 0  # a chain has no 2-core
    # the Spark empty path keeps the canonicalized node type
    e = spark.createDataFrame([(i, i + 1) for i in range(30)], "src int, dst long")
    out = k_core(e, k=2)
    assert out.count() == 0
    assert dict(out.dtypes)["node"] == "bigint"  # promoted, both paths agree


def test_kcore_parity_with_duckdb(spark):
    rng = np.random.RandomState(23)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 60, size=(300, 2))]
    got = k_core(_edges(spark, pairs), k=4).toPandas()
    con = duckdb_con(SF_SMALL)
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    want = con.execute(
        oracle.k_core_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)", k=4, rounds=10)
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []
