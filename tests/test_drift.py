"""Column profiles + drift report (reports/drift.py): exact counts,
KMV-lossless distinct on small cardinalities, all-null columns, and the
ordered drift statuses (added/removed/null_rate/distinct/ok)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.reports.drift import drift_report, profile_columns, schema_drift


def test_profile_exact_counts_and_lossless_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id bigint, s string"
    )
    got = {r["column"]: r for r in profile_columns(df).collect()}
    assert (got["id"]["n_rows"], got["id"]["n_null"], got["id"]["distinct_est"]) == (4, 0, 4)
    assert (got["s"]["n_rows"], got["s"]["n_null"], got["s"]["distinct_est"]) == (4, 1, 2)


def test_profile_all_null_column(spark):
    df = spark.range(5).select(F.lit(None).cast("string").alias("x"))
    r = profile_columns(df).collect()[0]
    assert (r["n_rows"], r["n_null"], r["distinct_est"]) == (5, 5, 0)


def test_drift_statuses(spark):
    base = spark.createDataFrame(
        [
            ("stable", 1000, 10, 50),
            ("nulls_jump", 1000, 10, 50),
            ("ids_collapse", 1000, 0, 900),
            ("gone", 1000, 0, 5),
        ],
        "column string, n_rows bigint, n_null bigint, distinct_est bigint",
    )
    new = spark.createDataFrame(
        [
            ("stable", 1200, 14, 55),
            ("nulls_jump", 1200, 400, 50),
            ("ids_collapse", 1200, 0, 90),
            ("fresh", 1200, 0, 7),
        ],
        "column string, n_rows bigint, n_null bigint, distinct_est bigint",
    )
    got = {r["column"]: r["status"] for r in drift_report(base, new).collect()}
    assert got == {
        "stable": "ok",
        "nulls_jump": "null_rate_drift",
        "ids_collapse": "distinct_drift",
        "gone": "removed",
        "fresh": "added",
    }


def test_drift_null_delta_value(spark):
    base = spark.createDataFrame(
        [("c", 100, 10, 5)],
        "column string, n_rows bigint, n_null bigint, distinct_est bigint",
    )
    new = spark.createDataFrame(
        [("c", 200, 60, 5)],
        "column string, n_rows bigint, n_null bigint, distinct_est bigint",
    )
    r = drift_report(base, new).collect()[0]
    assert r["null_rate_delta"] == 0.2  # 0.30 - 0.10
    assert r["distinct_ratio"] == 1.0


def test_schema_drift(spark):
    a = spark.createDataFrame([(1, "x", 2.0)], "id bigint, s string, v double")
    b = spark.createDataFrame([(1, 3, True)], "id bigint, s int, fresh boolean")
    assert schema_drift(a, b) == [
        ("fresh", "added", None, "boolean"),
        ("s", "retyped", "string", "int"),
        ("v", "removed", "double", None),
    ]
    assert schema_drift(a, a) == []
