"""Expectations engine (reports/expectations.py): per-rule counts in one
aggregate, closed-world NULL-fails law, quarantine split with violation
names, loud guards (empty/dup/non-identifier rule names, violations
collision), single-scan plan, empty-input rows, and DuckDB parity
(oracle.expectation_report_sql)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.reports.expectations import (
    expectation_report,
    quarantine_split,
    with_violations,
)

SCHEMA = "id bigint, qty bigint, code string"
ROWS = [
    (1, 5, "QABCD"),
    (2, -3, "QXY"),       # fails positive_qty
    (3, None, "QABCD"),   # NULL qty → fails positive_qty (closed world)
    (4, 7, None),         # NULL code → fails code_prefix
    (5, 9, "XABCD"),      # fails code_prefix
]


def _rules():
    return [
        ("positive_qty", F.col("qty") > 0),
        ("code_prefix", F.col("code").startswith("Q")),
        ("has_id", F.col("id").isNotNull()),
    ]


def _rules_sql():
    return [
        ("positive_qty", "qty > 0"),
        ("code_prefix", "code LIKE 'Q%'"),
        ("has_id", "id IS NOT NULL"),
    ]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_report_counts_and_null_fails(spark):
    got = {r["rule"]: (r["n_pass"], r["n_fail"], r["fail_rate"]) for r in
           expectation_report(_df(spark), _rules()).collect()}
    assert got["positive_qty"] == (3, 2, 0.4)
    assert got["code_prefix"] == (3, 2, 0.4)
    assert got["has_id"] == (5, 0, 0.0)


def test_quarantine_split(spark):
    good, bad = quarantine_split(_df(spark), _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    vio = {r["id"]: sorted(r["violations"]) for r in bad.collect()}
    assert vio == {
        2: ["positive_qty"],  # "QXY" passes the prefix rule
        3: ["positive_qty"],
        4: ["code_prefix"],
        5: ["code_prefix"],
    }


def test_good_plus_bad_partitions_input(spark):
    good, bad = quarantine_split(_df(spark), _rules())
    assert good.count() + bad.count() == len(ROWS)


def test_empty_input_emits_all_rules(spark):
    empty = spark.createDataFrame([], SCHEMA)
    got = {r["rule"]: (r["n_pass"], r["n_fail"], r["fail_rate"]) for r in
           expectation_report(empty, _rules()).collect()}
    assert got == {
        "positive_qty": (0, 0, 0.0),
        "code_prefix": (0, 0, 0.0),
        "has_id": (0, 0, 0.0),
    }


def test_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="empty rule set"):
        expectation_report(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        expectation_report(df, [("a", F.lit(True)), ("a", F.lit(True))])
    with pytest.raises(ValueError, match="A-Za-z0-9"):
        expectation_report(df, [("has space", F.lit(True))])
    with pytest.raises(ValueError, match="A-Za-z0-9"):
        expectation_report(df, [("dotted.name", F.lit(True))])
    with pytest.raises(ValueError, match="violations"):
        with_violations(df.withColumn("violations", F.lit("x")), _rules())


def test_report_is_one_scan_one_aggregate(spark):
    out = expectation_report(_df(spark), _rules())
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # every rule rides the SAME aggregate: one HashAggregate pair
    # (partial+final) over one scan, never a per-rule pass.  Count the
    # tree form "Scan ExistingRDD (N)" — formatted mode also reprints
    # each node in the details section.
    assert plan.count("Scan ExistingRDD (") == 1, plan
    assert "Join" not in plan


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    spark_pdf = expectation_report(_df(spark), _rules()).toPandas()
    vals = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in row
        ) + ")"
        for row in ROWS
    )
    sql = oracle.expectation_report_sql(
        f"SELECT * FROM (VALUES {vals}) t(id, qty, code)", _rules_sql()
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
