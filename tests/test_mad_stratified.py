"""MAD robust outliers (reports.anomaly.mad_outliers) and exact
stratified sampling (sampling.stratified_sample): hand-computed laws,
exact-budget guarantees, NULL three-valued semantics, determinism, and
DuckDB parity for both."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.sampling import stratified_sample
from etl_scripts_spark.reports.anomaly import mad_outliers
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def _vals(spark, rows, schema="id long, grp string, v long"):
    return spark.createDataFrame(rows, schema)


def test_mad_hand_computed_global(spark):
    # values 1..9 plus 100: med = value at rank ceil(0.5*10)=5 -> 5
    # devs |x-5|: 4,3,2,1,0,1,2,3,4,95 sorted 0,1,1,2,2,3,3,4,4,95
    # mad = rank 5 -> 2; fence k=3: dev > 6 -> only 100 (dev 95)
    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    out = {r.id: r for r in mad_outliers(_vals(spark, rows), "v").collect()}
    assert out[9].is_outlier is True and out[9].med == 5 and out[9].mad == 2
    assert all(out[i].is_outlier is False for i in range(9))


def test_mad_grouped_and_null_semantics(spark):
    rows = [
        (1, "a", 10), (2, "a", 11), (3, "a", 12), (4, "a", 1000),
        (5, "b", None), (6, "b", 5),
        (7, None, 7),
    ]
    out = {r.id: r for r in mad_outliers(_vals(spark, rows), "v", by="grp").collect()}
    assert out[4].is_outlier is True
    assert out[5].is_outlier is None          # NULL value -> NULL flag
    assert out[7].med == 7                    # NULL group survives eqNullSafe
    assert out[7].is_outlier is False
    # all-NULL group: med/mad/flag all NULL
    allnull = _vals(spark, [(1, "z", None), (2, "z", None)])
    r = mad_outliers(allnull, "v", by="grp").collect()[0]
    assert r.med is None and r.mad is None and r.is_outlier is None


def test_mad_boundary_is_integer_exact(spark):
    # dev == k*mad exactly must NOT flag (strict >): values 0,10,20 ->
    # med 10, devs 10,0,10 -> mad 10; k=1 -> fences at dev>10
    rows = [(1, "a", 0), (2, "a", 10), (3, "a", 20)]
    out = mad_outliers(_vals(spark, rows), "v", k_num=1, k_den=1).collect()
    assert all(r.is_outlier is False for r in out)


def test_mad_guards(spark):
    df = _vals(spark, [(1, "a", 1)])
    with pytest.raises(ValueError):
        mad_outliers(df, "v", k_num=-1)
    with pytest.raises(ValueError):
        mad_outliers(df, "v", k_den=0)
    floats = spark.createDataFrame([(1, 1.5)], "id long, v double")
    with pytest.raises(ValueError):
        mad_outliers(floats, "v")


def test_mad_parity_with_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", F.length("text").alias("v")
    )
    got = (
        mad_outliers(docs, "v", by="source", k_num=3, k_den=2)
        .withColumn("is_outlier", F.col("is_outlier").cast("int"))
        .toPandas()
    )
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        "SELECT * EXCLUDE (is_outlier), is_outlier::INT AS is_outlier FROM ("
        + oracle.mad_outliers_sql(
            "SELECT doc_id, source, length(text) AS v FROM documents",
            "v",
            by="source",
            k_num=3,
            k_den=2,
        )
        + ")"
    ).fetchdf()
    assert len(want) > 0 and want["is_outlier"].sum() > 0
    assert compare(got, want) == []


# ------------------------------------------------------- stratified


def test_stratified_exact_budget_and_proportions(spark):
    # strata sizes 60/30/10; total 10 -> exact allocation 6/3/1
    rows = (
        [(i, "big", i) for i in range(60)]
        + [(100 + i, "mid", i) for i in range(30)]
        + [(200 + i, "small", i) for i in range(10)]
    )
    out = stratified_sample(_vals(spark, rows), 10, "grp", "id").collect()
    assert len(out) == 10
    by = {}
    for r in out:
        by[r.grp] = by.get(r.grp, 0) + 1
    assert by == {"big": 6, "mid": 3, "small": 1}


def test_stratified_largest_remainder_and_determinism(spark):
    # sizes 5/5/5, total 7: base = 7*5//15 = 2 each (6 spent), 1 leftover
    # -> remainders all equal (35 mod 15 = 5) -> stratum-key tiebreak: 'a'
    rows = [(i + 10 * k, g, i) for k, g in enumerate("abc") for i in range(5)]
    df = _vals(spark, rows)
    out1 = sorted(r.id for r in stratified_sample(df, 7, "grp", "id").collect())
    out2 = sorted(r.id for r in stratified_sample(df.repartition(7), 7, "grp", "id").collect())
    assert out1 == out2  # partitioning cannot change membership
    counts = {}
    for r in stratified_sample(df, 7, "grp", "id").collect():
        counts[r.grp] = counts.get(r.grp, 0) + 1
    assert counts == {"a": 3, "b": 2, "c": 2}
    # a different salt draws a different (same-shaped) sample
    alt = sorted(r.id for r in stratified_sample(df, 7, "grp", "id", salt="other").collect())
    assert len(alt) == 7


def test_stratified_null_stratum_and_guards(spark):
    rows = [(1, None, 1), (2, None, 2), (3, "a", 3), (4, "a", 4)]
    out = stratified_sample(_vals(spark, rows), 2, "grp", "id").collect()
    assert len(out) == 2
    assert sorted((r.grp or "_null") for r in out) == ["_null", "a"]
    with pytest.raises(ValueError):
        stratified_sample(_vals(spark, rows), -1, "grp", "id")
    with pytest.raises(Exception) as e:
        stratified_sample(_vals(spark, rows), 99, "grp", "id").collect()
    assert "exceeds the input row count" in str(e.value)
    # EMPTY input: empty sample (documented — AQE short-circuits the
    # empty probe side before the allocation guard can ever evaluate)
    empty = spark.createDataFrame([], "id long, grp string, v long")
    assert stratified_sample(empty, 1, "grp", "id").count() == 0
    assert stratified_sample(empty, 0, "grp", "id").count() == 0


def test_stratified_oracle_mirrors_overbudget_guard(spark):
    """The DuckDB twin raises on total_n > input rows just like the op —
    without the mirrored guard it would silently return fewer rows."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, grp VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(1, "a"), (2, "b")])
    with pytest.raises(duckdb.Error) as e:
        con.execute(
            oracle.stratified_sample_sql("SELECT id, grp FROM t", 99, "grp", "id")
        ).fetchall()
    assert "exceeds input rows" in str(e.value)


def test_stratified_total_equals_input_takes_everything(spark):
    rows = [(i, "ab"[i % 2], i) for i in range(10)]
    assert stratified_sample(_vals(spark, rows), 10, "grp", "id").count() == 10


def test_stratified_parity_with_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", "lang"
    )
    got = stratified_sample(docs, 97, "source", "doc_id").toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.stratified_sample_sql(
            "SELECT doc_id, source, lang FROM documents",
            97,
            "source",
            "doc_id",
        )
    ).fetchdf()
    assert len(want) == 97
    assert compare(got, want) == []
