"""Interval-overlap join (operators/intervals.py): brute-force equality on
randomized fixtures, emit-once exactness across multi-bin spans, endpoint
and negative-coordinate laws, loud guards, plan shape (equi-join, never a
nested loop), and DuckDB native-IEJoin parity (oracle.interval_join_sql)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.intervals import (
    interval_join,
    point_in_interval_join,
)

L_SCHEMA = "lid bigint, chrom string, start bigint, end bigint"
R_SCHEMA = "rid bigint, chrom string, start bigint, end bigint"


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _pairs(df):
    return sorted((r["lid"], r["rid_r"]) for r in df.select("lid", "rid_r").collect())


def _brute(lrows, rrows, keyed=True):
    out = []
    for lid, lc, ls, le in lrows:
        for rid, rc, rs, re_ in rrows:
            if keyed and lc != rc:
                continue
            if ls <= re_ and rs <= le:
                out.append((lid, rid))
    return sorted(out)


def _random_rows(seed, n, span_max, coord_max, n_keys=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randint(-coord_max, coord_max)
        rows.append((i, f"chr{rng.randint(1, n_keys)}", s, s + rng.randint(0, span_max)))
    return rows


def test_hand_fixture_endpoints_and_nesting(spark):
    # touching endpoints overlap (closed intervals); nesting; key isolation
    lrows = [(1, "a", 0, 10), (2, "a", 10, 20), (3, "b", 0, 100)]
    rrows = [(10, "a", 10, 10), (11, "a", 21, 30), (12, "a", 2, 3), (13, "b", 50, 60)]
    got = _pairs(
        interval_join(_mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA), by="chrom", bin_width=8)
    )
    assert got == [(1, 10), (1, 12), (2, 10), (3, 13)]


@pytest.mark.parametrize("bin_width", [1, 7, 1000])
def test_randomized_equals_brute_force(spark, bin_width):
    lrows = _random_rows(41, 120, span_max=40, coord_max=300)
    rrows = _random_rows(42, 120, span_max=40, coord_max=300)
    got = _pairs(
        interval_join(
            _mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA),
            by="chrom", bin_width=bin_width, max_bins=1000,
        )
    )
    assert got == _brute(lrows, rrows)


def test_emit_once_no_duplicate_pairs(spark):
    # long intervals share MANY bins at W=1; each pair must appear once
    lrows = [(1, "a", 0, 50)]
    rrows = [(10, "a", 25, 60), (11, "a", -5, 5)]
    df = interval_join(
        _mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA),
        by="chrom", bin_width=1, max_bins=1000,
    )
    assert _pairs(df) == [(1, 10), (1, 11)]


def test_negative_coordinates_bin_floor(spark):
    # a pair straddling zero: truncating division would miss the shared bin
    lrows = [(1, "a", -3, -1)]
    rrows = [(10, "a", -2, 4)]
    got = _pairs(
        interval_join(_mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA), by="chrom", bin_width=5)
    )
    assert got == [(1, 10)]


def test_unkeyed_join(spark):
    lrows = [(1, "a", 0, 5)]
    rrows = [(10, "zzz", 5, 9)]
    got = _pairs(
        interval_join(_mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA), bin_width=4)
    )
    assert got == [(1, 10)]


def test_null_bounds_match_nothing(spark):
    lrows = [(1, "a", None, 10), (2, "a", 0, None), (3, "a", 0, 10)]
    rrows = [(10, "a", 0, 100)]
    got = _pairs(
        interval_join(_mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA), by="chrom")
    )
    assert got == [(3, 10)]


def test_inverted_interval_raises(spark):
    df = interval_join(
        _mk(spark, [(1, "a", 10, 5)], L_SCHEMA),
        _mk(spark, [(10, "a", 0, 100)], R_SCHEMA),
        by="chrom",
    )
    with pytest.raises(Exception, match="inverted interval"):
        df.collect()


def test_max_bins_raises(spark):
    df = interval_join(
        _mk(spark, [(1, "a", 0, 10_000_000)], L_SCHEMA),
        _mk(spark, [(10, "a", 0, 100)], R_SCHEMA),
        by="chrom", bin_width=10, max_bins=100,
    )
    with pytest.raises(Exception, match="max_bins"):
        df.collect()


def test_nonpositive_bin_width_raises(spark):
    l, r = _mk(spark, [(1, "a", 3, 7)], L_SCHEMA), _mk(spark, [(10, "a", 7, 12)], R_SCHEMA)
    # negative W silently dropped overlapping pairs before the guard
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(l, r, by="chrom", bin_width=-5)
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(l, r, by="chrom", bin_width=0)
    with pytest.raises(ValueError, match="max_bins"):
        interval_join(l, r, by="chrom", bin_width=5, max_bins=0)


def test_reserved_bin_column_raises(spark):
    l = _mk(spark, [(1, "a", 3, 7)], L_SCHEMA).withColumn("_bin", F.lit(9))
    r = _mk(spark, [(10, "a", 7, 12)], R_SCHEMA)
    with pytest.raises(ValueError, match="_bin"):
        interval_join(l, r, by="chrom")
    with pytest.raises(ValueError, match="_bin"):
        interval_join(r, l, by="chrom")


def test_column_collision_raises(spark):
    left = _mk(spark, [(1, "a", 0, 10)], L_SCHEMA).withColumnRenamed("lid", "rid_r")
    with pytest.raises(ValueError, match="collide"):
        interval_join(left, _mk(spark, [(10, "a", 0, 10)], R_SCHEMA), by="chrom")


def test_plan_is_equi_join_not_nested_loop(spark):
    df = interval_join(
        _mk(spark, _random_rows(1, 50, 20, 200), L_SCHEMA),
        _mk(spark, _random_rows(2, 50, 20, 200), R_SCHEMA),
        by="chrom", bin_width=16,
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_point_in_interval(spark):
    points = _mk(
        spark,
        [(1, "a", 5), (2, "a", 10), (3, "a", 11), (4, "b", 5)],
        "pid bigint, chrom string, pos bigint",
    )
    ivs = _mk(spark, [(10, "a", 0, 10), (11, "b", 0, 3)], R_SCHEMA)
    got = sorted(
        (r["pid"], r["rid_r"])
        for r in point_in_interval_join(points, ivs, on="pos", by="chrom", bin_width=4).collect()
    )
    assert got == [(1, 10), (2, 10)]


def test_point_randomized_equals_brute_force(spark):
    rng = random.Random(7)
    prows = [(i, f"chr{rng.randint(1, 3)}", rng.randint(-100, 100)) for i in range(150)]
    rrows = _random_rows(8, 80, span_max=30, coord_max=100)
    got = sorted(
        (r["pid"], r["rid_r"])
        for r in point_in_interval_join(
            _mk(spark, prows, "pid bigint, chrom string, pos bigint"),
            _mk(spark, rrows, R_SCHEMA),
            on="pos", by="chrom", bin_width=9,
        ).collect()
    )
    want = sorted(
        (pid, rid)
        for pid, pc, pos in prows
        for rid, rc, rs, re_ in rrows
        if pc == rc and rs <= pos <= re_
    )
    assert got == want


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    lrows = _random_rows(43, 100, span_max=35, coord_max=250)
    rrows = _random_rows(44, 100, span_max=35, coord_max=250)
    spark_pdf = interval_join(
        _mk(spark, lrows, L_SCHEMA), _mk(spark, rrows, R_SCHEMA), by="chrom", bin_width=13
    ).toPandas()

    def cte(rows, idc):
        vals = ", ".join(f"({i}, '{c}', {s}, {e})" for i, c, s, e in rows)
        return f"SELECT * FROM (VALUES {vals}) t({idc}, chrom, start, \"end\")"

    sql = oracle.interval_join_sql(
        cte(lrows, "lid"), cte(rrows, "rid"),
        l_cols=["lid", "chrom", "start", "end"],
        r_cols=["rid", "chrom", "start", "end"],
        by="chrom",
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems


def test_band_join_matches_brute_force(spark):
    rng = random.Random(71)
    lrows = [(i, f"k{i % 2}", rng.randint(-100, 100)) for i in range(100)]
    rrows = [(100 + i, f"k{i % 2}", rng.randint(-100, 100)) for i in range(100)]
    from etl_scripts_spark.operators.intervals import band_join

    ldf = _mk(spark, lrows, "lid bigint, chrom string, v bigint")
    rdf = _mk(spark, rrows, "rid bigint, chrom string, v bigint")
    got = sorted(
        (r["lid"], r["rid_r"])
        for r in band_join(ldf, rdf, on="v", eps=3, by="chrom").collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lc, lv in lrows
        for rid, rc, rv in rrows
        if lc == rc and abs(lv - rv) <= 3
    )
    assert got == want


def test_band_join_eps_zero_is_equi(spark):
    from etl_scripts_spark.operators.intervals import band_join

    ldf = _mk(spark, [(1, "a", 5)], "lid bigint, chrom string, v bigint")
    rdf = _mk(spark, [(10, "a", 5), (11, "a", 6)], "rid bigint, chrom string, v bigint")
    got = [(r["lid"], r["rid_r"]) for r in band_join(ldf, rdf, on="v", eps=0).collect()]
    assert got == [(1, 10)]
    with pytest.raises(ValueError, match="eps"):
        band_join(ldf, rdf, on="v", eps=-1)
