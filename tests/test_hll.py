"""HyperLogLog (sketch.hll_registers/hll_merge/hll_estimate): register
law by hand, merge algebra, accuracy envelope, small-range branch,
DuckDB parity, and the no-dedup-shuffle build shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.sketch import (
    _hll_alpha,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con, plan_of


def _py_register(value: str, p: int):
    """Python-bigint reference of the bucket/rho law."""
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:4], 16) % (1 << p)
    w = int(h[4:16], 16)
    rho = 49 if w == 0 else 49 - len(bin(w)[2:])
    return bucket, rho


def test_register_law_matches_python_reference(spark):
    vals = [(1, f"v{i}") for i in range(500)]
    df = spark.createDataFrame(vals, "g int, v string")
    got = {
        r.bucket: r.register
        for r in hll_registers(df, "g", "v", p=6).collect()
    }
    want: dict[int, int] = {}
    for _, v in vals:
        b, rho = _py_register(v, 6)
        want[b] = max(want.get(b, 0), rho)
    assert got == want


def test_duplicates_change_nothing(spark):
    base = [(1, f"v{i}") for i in range(200)]
    df1 = spark.createDataFrame(base, "g int, v string")
    df2 = spark.createDataFrame(base * 5, "g int, v string")
    a = hll_distinct(df1, "g", "v", p=8).collect()[0].hll_distinct
    b = hll_distinct(df2, "g", "v", p=8).collect()[0].hll_distinct
    assert a == b


def test_merge_equals_whole(spark):
    rows = [(1, f"x{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g int, v string")
    half1 = df.filter(F.length("v") % 2 == 0)
    half2 = df.filter(F.length("v") % 2 == 1)
    merged = hll_merge(
        hll_registers(half1, "g", "v", p=10),
        hll_registers(half2, "g", "v", p=10),
        "g",
    )
    whole = hll_registers(df, "g", "v", p=10)
    got = {(r.bucket): r.register for r in merged.collect()}
    want = {(r.bucket): r.register for r in whole.collect()}
    assert got == want
    e_m = hll_estimate(merged, "g", p=10).collect()[0].hll_distinct
    e_w = hll_estimate(whole, "g", p=10).collect()[0].hll_distinct
    assert e_m == e_w


def test_accuracy_envelope(spark):
    """σ = 1.04/√m; at p=12 that is 1.6% — assert within 4σ."""
    n = 20_000
    df = spark.createDataFrame([(1, f"item-{i}") for i in range(n)], "g int, v string")
    est = hll_distinct(df, "g", "v", p=12).collect()[0].hll_distinct
    sigma = 1.04 / math.sqrt(1 << 12)
    assert abs(est - n) / n < 4 * sigma, est


def test_small_range_linear_counting(spark):
    """With 3 distinct values and m=4096 the small-range branch must
    fire: estimate = m·ln(m/zeros) with zeros = m - 3 (all buckets
    distinct at this density) — nearly exact."""
    df = spark.createDataFrame([(1, "a"), (1, "b"), (1, "c")], "g int, v string")
    est = hll_distinct(df, "g", "v", p=12).collect()[0].hll_distinct
    m = 4096
    assert est == pytest.approx(m * math.log(m / (m - 3)), abs=1e-4)


def test_null_values_drop(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "b")], "g int, v string"
    )
    base = spark.createDataFrame([(1, "a"), (1, "b")], "g int, v string")
    assert (
        hll_distinct(df, "g", "v", p=8).collect()
        == hll_distinct(base, "g", "v", p=8).collect()
    )


def test_p_bounds_raise(spark):
    df = spark.createDataFrame([(1, "a")], "g int, v string")
    for bad in (3, 17):
        with pytest.raises(ValueError, match="p must be"):
            hll_registers(df, "g", "v", p=bad)


def test_non_string_value_raises(spark):
    """A non-string column would hash each engine's own float rendering —
    the build refuses instead of silently breaking parity."""
    df = spark.createDataFrame([(1, 0.0001)], "g int, v double")
    with pytest.raises(ValueError, match="must be string"):
        hll_registers(df, "g", "v", p=8)


def test_estimate_p_mismatch_raises(spark):
    """Registers built at p=12 estimated at p=8: buckets exceed m and the
    in-plan guard fires instead of returning garbage."""
    df = spark.createDataFrame([(1, f"v{i}") for i in range(2000)], "g int, v string")
    regs = hll_registers(df, "g", "v", p=12)
    with pytest.raises(Exception, match="built with larger p"):
        hll_estimate(regs, "g", p=8).collect()


def test_alpha_mirrors_stay_synced():
    """oracle._hll_alpha is an import-free mirror of sketch._hll_alpha —
    pin them equal for every legal p."""
    from etl_scripts_spark.oracle import _hll_alpha as oracle_alpha
    for p in range(4, 17):
        assert oracle_alpha(p) == _hll_alpha(p), p


def test_parity_with_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = hll_distinct(docs, "source", "text", p=10).toPandas()
    want = duckdb_con(SF_SMALL).execute(
        oracle.hll_distinct_sql("SELECT * FROM documents", "source", "text", p=10)
    ).fetchdf()
    assert len(got) > 1
    assert compare(got, want) == []


def test_build_has_single_aggregate_no_distinct(spark):
    """The build is ONE groupBy straight off the scan — no distinct
    pre-shuffle (max is idempotent), no Python, no nested loop."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = plan_of(hll_registers(docs, "source", "text"))
    for marker in ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, marker
    # exactly one exchange: the (group, bucket) aggregate's (count the
    # detail-section headers — the tree section repeats each node)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
