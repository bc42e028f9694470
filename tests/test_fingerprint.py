"""Order-independent table fingerprint (exactness.table_fingerprint):
multiset semantics, canonical-encoding distinctions, loud type guards,
and DuckDB parity of the full (sum mod 2^61−1, xor, count) law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark.exactness import FP_MOD, table_fingerprint


def _one(df):
    r = df.collect()
    assert len(r) == 1
    return (r[0]["n_rows"], r[0]["fp_sum"], r[0]["fp_xor"])


def test_order_and_partitioning_independent(spark):
    rows = [(i, f"s{i % 7}", i % 2 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, s string, b boolean")
    a = _one(table_fingerprint(df.repartition(13)))
    b = _one(table_fingerprint(df.coalesce(1).sort(F.desc("id"))))
    assert a == b and a[0] == 500


def test_multiset_semantics_duplicate_row_detected_by_sum(spark):
    """Duplicating one row TWICE cancels in xor (x^x=0 net) but moves the
    sum and the count — the reason the fingerprint carries all three."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    dup2 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (2, "b")], "id bigint, s string"
    )
    fa, fd = _one(table_fingerprint(base)), _one(table_fingerprint(dup2))
    assert fa[2] == fd[2]  # xor blind to even multiplicity
    assert fa[0] != fd[0] and fa[1] != fd[1]  # count+sum are not


def test_single_value_change_changes_everything(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    b = spark.createDataFrame([(1, "a"), (2, "c")], "id bigint, s string")
    fa, fb = _one(table_fingerprint(a)), _one(table_fingerprint(b))
    assert fa[0] == fb[0] and fa[1] != fb[1] and fa[2] != fb[2]


def test_null_empty_and_value_tokens_distinct(spark):
    """NULL, '', and the string 'v' must all hash differently — the
    canonical 'v'-prefix/\\x01 encoding exists exactly for this."""
    fps = set()
    for v in [None, "", "v"]:
        df = spark.createDataFrame([(1, v)], "id bigint, s string")
        fps.add(_one(table_fingerprint(df))[1])
    assert len(fps) == 3


def test_column_boundary_not_ambiguous(spark):
    """('ab','c') vs ('a','bc') must differ — the \\x1f separator."""
    a = spark.createDataFrame([("ab", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert _one(table_fingerprint(a))[1] != _one(table_fingerprint(b))[1]


def test_grouped_fingerprints_localize_the_diff(spark):
    df = spark.createDataFrame(
        [(p, i, f"s{i}") for p in ("a", "b") for i in range(50)],
        "part string, id bigint, s string",
    )
    df2 = df.withColumn(
        "s", F.when((F.col("part") == "b") & (F.col("id") == 7), "X").otherwise(F.col("s"))
    )
    fp1 = {r["part"]: (r["fp_sum"], r["fp_xor"]) for r in table_fingerprint(df, by=["part"]).collect()}
    fp2 = {r["part"]: (r["fp_sum"], r["fp_xor"]) for r in table_fingerprint(df2, by=["part"]).collect()}
    assert fp1["a"] == fp2["a"] and fp1["b"] != fp2["b"]


def test_empty_table_is_zero(spark):
    df = spark.createDataFrame([], "id bigint, s string")
    assert _one(table_fingerprint(df)) == (0, 0, 0)


def test_render_unstable_types_raise(spark):
    df = spark.createDataFrame([(1, 2.5)], "id bigint, d double")
    with pytest.raises(ValueError, match="render identically"):
        table_fingerprint(df)
    with pytest.raises(ValueError, match="no content columns"):
        table_fingerprint(df.select("id"), cols=[], by=["id"])


def test_duckdb_parity(spark):
    import duckdb

    from etl_scripts_spark.oracle import table_fingerprint_sql
    from tests.parity import compare

    rows = [(i % 3, i, None if i % 11 == 0 else f"s{i % 13}", i % 2 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, id bigint, s string, b boolean")
    got = table_fingerprint(df, cols=["id", "s", "b"], by=["g"]).toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INTEGER, id BIGINT, s VARCHAR, b BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    want = con.execute(
        table_fingerprint_sql("SELECT * FROM t", ["id", "s", "b"], by=["g"])
    ).fetchdf()
    assert compare(got, want) == []
    # and the mod actually engaged (raw 60-bit sums pass 2^61-1 here)
    assert all(0 <= r["fp_sum"] < FP_MOD for r in table_fingerprint(df).collect())
