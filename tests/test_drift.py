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


def _hist_df(spark, rows):
    return spark.createDataFrame(rows, "column string, bin int, cnt bigint")


def test_psi_identical_distributions_are_stable(spark):
    from etl_scripts_spark.reports.drift import psi_report

    h = _hist_df(spark, [("c", 0, 100), ("c", 1, 300), ("c", 2, 600)])
    r = psi_report(h, h).collect()[0]
    assert float(r["psi"]) == 0.0 and r["status"] == "stable"


def test_psi_shifted_distribution_flags(spark):
    """Mass moving from bin 0 to bin 2 produces a large PSI; the value
    matches a hand computation of the smoothed law."""
    import math

    from etl_scripts_spark.reports.drift import psi_report

    base = _hist_df(spark, [("c", 0, 900), ("c", 1, 100)])
    new = _hist_df(spark, [("c", 0, 100), ("c", 1, 100), ("c", 2, 800)])
    r = psi_report(base, new).collect()[0]
    bt, nt = 900 + 100 + 0 + 3, 100 + 100 + 800 + 3
    want = 0.0
    for bc, nc in ((900, 100), (100, 100), (0, 800)):
        p, q = (bc + 1) / bt, (nc + 1) / nt
        want += round((p - q) * math.log(p / q), 9)
    assert abs(float(r["psi"]) - want) < 1e-9
    assert r["status"] == "shifted"


def test_psi_scale_invariant(spark):
    """Same SHAPE at 10x the row count stays stable — PSI compares
    proportions, not counts."""
    from etl_scripts_spark.reports.drift import psi_report

    base = _hist_df(spark, [("c", 0, 10), ("c", 1, 30), ("c", 2, 60)])
    new = _hist_df(spark, [("c", 0, 100), ("c", 1, 300), ("c", 2, 600)])
    r = psi_report(base, new).collect()[0]
    assert float(r["psi"]) < 0.01 and r["status"] == "stable"


def test_psi_multi_column_and_partitioning_independent(spark):
    from etl_scripts_spark.reports.drift import psi_report

    base = _hist_df(
        spark,
        [("a", 0, 500), ("a", 1, 500), ("b", 0, 900), ("b", 1, 100)],
    )
    new = _hist_df(
        spark,
        [("a", 0, 510), ("a", 1, 490), ("b", 0, 100), ("b", 1, 900)],
    )
    got1 = {
        r["column"]: (str(r["psi"]), r["status"])
        for r in psi_report(base.repartition(5), new.repartition(3)).collect()
    }
    got2 = {
        r["column"]: (str(r["psi"]), r["status"])
        for r in psi_report(base.coalesce(1), new.coalesce(1)).collect()
    }
    assert got1 == got2
    assert got1["a"][1] == "stable" and got1["b"][1] == "shifted"


def test_psi_rejects_zero_smoothing(spark):
    import pytest as _pt

    from etl_scripts_spark.reports.drift import psi_report

    h = _hist_df(spark, [("c", 0, 10)])
    with _pt.raises(ValueError, match="smoothing"):
        psi_report(h, h, smoothing=0)


def test_profile_columns_duckdb_oracle_parity(spark):
    """oracle.profile_columns_sql reproduces profile_columns exactly —
    exact counts, the lossless branch, AND the estimate branch (k=16
    with 40 distinct values), plus an all-null column."""
    import duckdb

    from etl_scripts_spark.oracle import profile_columns_sql

    rows = [
        (i, f"s{i % 40}", None if i % 3 == 0 else f"v{i % 7}", None)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id bigint, s string, t string, z string")
    got = sorted(
        tuple(r) for r in profile_columns(df, k=16).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tbl(id BIGINT, s VARCHAR, t VARCHAR, z VARCHAR)"
    )
    con.executemany("INSERT INTO tbl VALUES (?,?,?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            profile_columns_sql("tbl", ["id", "s", "t", "z"], k=16)
        ).fetchall()
    )
    assert got == want


def test_psi_report_duckdb_oracle_parity(spark):
    """oracle.psi_report_sql equals psi_report exactly, including the
    ln() evaluations at 9-dp rounding — the cross-engine risk this test
    exists to pin — over skewed, disjoint-bin, multi-group sketches."""
    import duckdb

    from etl_scripts_spark.reports.drift import psi_report

    base_rows = [("a", i, (i * 37) % 400 + 1) for i in range(32)] + [
        ("b", 0, 900),
        ("b", 1, 100),
    ]
    new_rows = [("a", i, (i * 53) % 380 + 7) for i in range(2, 40)] + [
        ("b", 1, 150),
        ("b", 2, 850),
    ]
    base = _hist_df(spark, base_rows)
    new = _hist_df(spark, new_rows)
    got = sorted(
        (r["column"], str(r["psi"]), r["status"])
        for r in psi_report(base, new).collect()
    )
    from etl_scripts_spark.oracle import psi_report_sql

    con = duckdb.connect()
    for t, rows in (("b0", base_rows), ("n0", new_rows)):
        con.execute(f'CREATE TABLE {t}("column" VARCHAR, bin INT, cnt BIGINT)')
        con.executemany(f"INSERT INTO {t} VALUES (?,?,?)", rows)
    want = sorted(
        (c, str(p), s)
        for c, p, s in con.execute(psi_report_sql("b0", "n0")).fetchall()
    )
    assert got == want
