"""Grouped OLS (reports/regression.py): exact-line fixture, python-exact
reference on randomized data, pairwise NULL exclusion, degenerate-variance
laws, float rejection, partitioning invariance, decimal-overflow raise,
and DuckDB oracle parity (oracle.grouped_ols_sql)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.reports.regression import grouped_ols

SCHEMA = "g string, x bigint, y bigint"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_exact_line(spark):
    rows = [("a", x, 3 * x + 2) for x in range(-5, 6)]
    got = _rows(grouped_ols(_df(spark, rows), "y", "x", ["g"]))
    assert got == [("a", 11, 3.0, 2.0, 1.0)]


def test_randomized_matches_python_exact(spark):
    rng = random.Random(3)
    rows = [
        (f"g{i % 4}", rng.randint(-100, 100), rng.randint(-100, 100))
        for i in range(400)
    ]
    got = {r[0]: r[1:] for r in grouped_ols(_df(spark, rows), "y", "x", ["g"]).collect()}
    for g in {r[0] for r in rows}:
        pts = [(x, y) for gg, x, y in rows if gg == g]
        n = len(pts)
        sx, sy = sum(x for x, _ in pts), sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx, syy = sum(x * x for x, _ in pts), sum(y * y for _, y in pts)
        covn, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        slope = float(covn) / float(varx)
        n_got, s_got, i_got, r_got = got[g]
        assert n_got == n
        assert abs(s_got - slope) < 1e-9
        assert abs(i_got - (float(sy) - slope * float(sx)) / float(n)) < 1e-9
        assert abs(r_got - float(covn) ** 2 / (float(varx) * float(vary))) < 1e-9


def test_null_rows_excluded_pairwise(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("a", None, 99), ("a", 3, None), ("a", 3, 30)]
    got = _rows(grouped_ols(_df(spark, rows), "y", "x", ["g"]))
    assert got == [("a", 3, 10.0, 0.0, 1.0)]


def test_degenerate_variances(spark):
    # zero x-variance: vertical line → all NULL; zero y-variance: slope 0
    rows = [("v", 5, 1), ("v", 5, 2), ("h", 1, 7), ("h", 2, 7), ("h", 3, 7)]
    got = {r["g"]: (r["slope"], r["intercept"], r["r2"]) for r in
           grouped_ols(_df(spark, rows), "y", "x", ["g"]).collect()}
    assert got["v"] == (None, None, None)
    assert got["h"] == (0.0, 7.0, None)


def test_all_null_group_emits_nothing(spark):
    rows = [("a", 1, 1), ("z", None, None)]
    got = _rows(grouped_ols(_df(spark, rows), "y", "x", ["g"]))
    assert [r[0] for r in got] == ["a"]


def test_float_input_raises(spark):
    df = spark.createDataFrame([("a", 1.5, 2)], "g string, x double, y bigint")
    with pytest.raises(ValueError, match="integer grid"):
        grouped_ols(df, "y", "x", ["g"])
    dec = spark.createDataFrame([("a", 2)], "g string, y bigint").select(
        "g", F.lit(1).cast("decimal(10,2)").alias("x"), "y"
    )
    with pytest.raises(ValueError, match="integer grid"):
        grouped_ols(dec, "y", "x", ["g"])


def test_partitioning_invariance(spark):
    rng = random.Random(9)
    rows = [(f"g{i % 3}", rng.randint(-50, 50), rng.randint(-50, 50)) for i in range(300)]
    a = _rows(grouped_ols(_df(spark, rows).repartition(1), "y", "x", ["g"]))
    b = _rows(grouped_ols(_df(spark, rows).repartition(16), "y", "x", ["g"]))
    assert a == b


def test_overflow_raises_not_nulls(spark):
    # ANSI mode (Spark 4 default) throws NUMERIC_VALUE_OUT_OF_RANGE at the
    # decimal multiply itself; under non-ANSI the in-plan raise_error guard
    # fires instead — either way the overflow is LOUD, never a NULL stat
    big = 5 * 10**18
    rows = [("a", big, 1), ("a", big - 1, 2), ("a", big - 2, 3)]
    with pytest.raises(Exception, match="overflowed|cannot be represented"):
        grouped_ols(_df(spark, rows), "y", "x", ["g"]).collect()


def test_ungrouped_whole_table(spark):
    rows = [("a", x, 2 * x - 1) for x in range(10)]
    got = grouped_ols(_df(spark, rows), "y", "x").collect()
    assert len(got) == 1 and got[0]["slope"] == 2.0 and got[0]["intercept"] == -1.0


def test_driver_fixture_is_nowhere_near_a_ten_digit_tie():
    """grouped_ols deliberately keeps FLOAT 9-dp rounding (the exact-e9
    forms for intercept/r2 need ~10⁶⁰ — outside DECIMAL(38,0)), with the
    documented boundary that a true quotient terminating at exactly 10
    decimal digits ending in 5 is engine-divergent (the r11 find).  The
    'data-shaped denominator ⇒ coincidental tie' claim gets a RECEIPT
    here: recompute every registered-fixture ratio (slope, intercept,
    r2 per l_returnflag) as an exact Fraction at each local testdata
    scale and assert none is a 10-digit tie.  If a testdata refresh ever
    lands on one, this fails BEFORE the driver's hash compare does."""
    import os
    from fractions import Fraction

    import __spark_entry__ as entrymod
    from tests.parity import duckdb_con

    def is_ten_digit_tie(fr: Fraction) -> bool:
        t = fr * 10**10
        return t.denominator == 1 and abs(t.numerator) % 10 == 5

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
            continue
        # the fixture law comes from the REGISTERED oracle constant, so
        # an edit to q_grouped_ols's fixture re-points this receipt
        rows = duckdb_con(sf_dir).execute(
            f"""
            WITH src AS (
              SELECT l_returnflag AS g, x, y
              FROM ({entrymod.GROUPED_OLS_FIXTURE_SQL})
            )
            SELECT g, count(*) FILTER (x IS NOT NULL AND y IS NOT NULL) AS n,
                   (sum(x) FILTER (y IS NOT NULL))::HUGEINT AS sx,
                   (sum(y) FILTER (x IS NOT NULL))::HUGEINT AS sy,
                   (sum(x::HUGEINT * y)) AS sxy,
                   (sum(x::HUGEINT * x) FILTER (y IS NOT NULL)) AS sxx,
                   (sum(y::HUGEINT * y) FILTER (x IS NOT NULL)) AS syy
            FROM src GROUP BY g
            """
        ).fetchall()
        for g, n, sx, sy, sxy, sxx, syy in rows:
            n, sx, sy, sxy, sxx, syy = map(int, (n, sx, sy, sxy, sxx, syy))
            covn, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
            assert varx > 0 and vary > 0, (sf, g)
            ratios = {
                "slope": Fraction(covn, varx),
                "intercept": Fraction(sy * varx - covn * sx, n * varx),
                "r2": Fraction(covn * covn, varx * vary),
            }
            for name, fr in ratios.items():
                assert not is_ten_digit_tie(fr), (sf, g, name, fr)
                checked += 1
    assert checked >= 3 * 3  # at least sf0.001's flags × three ratios


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    rng = random.Random(31)
    rows = [
        (f"g{i % 5}", rng.randint(-1000, 1000), rng.randint(-1000, 1000))
        for i in range(500)
    ] + [("vert", 7, v) for v in (1, 2, 3)] + [("flat", v, 5) for v in (1, 2, 4)]
    spark_pdf = grouped_ols(_df(spark, rows), "y", "x", ["g"]).toPandas()
    vals = ", ".join(f"('{g}', {x}, {y})" for g, x, y in rows)
    sql = oracle.grouped_ols_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, x, y)", "y", "x", ["g"]
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems


def test_ungrouped_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    rows = [("a", x, 3 * x - 4) for x in range(-6, 7)]
    spark_pdf = grouped_ols(_df(spark, rows), "y", "x").toPandas()
    vals = ", ".join(f"({x}, {y})" for _, x, y in rows)
    sql = oracle.grouped_ols_sql(
        f"SELECT * FROM (VALUES {vals}) t(x, y)", "y", "x", []
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
