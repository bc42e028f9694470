"""Benchmark decontamination (dedup.benchmark_contamination_pairs /
contamination_report): hand-computed fixtures, edge laws, DuckDB parity
on a real documents split, and the no-Python-hot-path plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.dedup import (
    benchmark_contamination_pairs,
    contamination_report,
)
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con, plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pairs_hand_computed(spark):
    # bench doc 100 = "a b c d e"; n=3 grams: abc bcd cde
    # train 1 contains "a b c d" -> shares abc, bcd (2 grams)
    # train 2 contains "c d e" once -> shares cde (1 gram)
    # train 3 disjoint
    train = _docs(spark, [
        (1, "x a b c d y"),
        (2, "z z c d e"),
        (3, "p q r s t u"),
    ])
    bench = _docs(spark, [(100, "a b c d e")])
    got = {
        (r.train_id, r.bench_id): r.n_shared_grams
        for r in benchmark_contamination_pairs(train, bench, n=3).collect()
    }
    assert got == {(1, 100): 2, (2, 100): 1}


def test_pairs_repeated_gram_counts_once(spark):
    # the shared gram appears 3x in train and 2x in bench — still 1
    train = _docs(spark, [(1, "a b c a b c a b c")])
    bench = _docs(spark, [(9, "a b c x y z a b c")])
    got = benchmark_contamination_pairs(train, bench, n=3).collect()
    assert len(got) == 1 and got[0].n_shared_grams == 1


def test_short_docs_yield_nothing(spark):
    train = _docs(spark, [(1, "a b")])
    bench = _docs(spark, [(9, "a b")])
    assert benchmark_contamination_pairs(train, bench, n=3).count() == 0


def test_report_hand_computed(spark):
    # train 1: words x a b c d y -> 4 gram positions (n=3);
    # hit positions: 2 (abc), 3 (bcd) -> frac 0.5
    train = _docs(spark, [(1, "x a b c d y"), (3, "p q r s t")])
    bench = _docs(spark, [(100, "a b c d e")])
    rows = contamination_report(train, bench, n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.train_id, r.n_hit_positions, r.n_grams) == (1, 2, 4)
    assert r.contaminated_frac == 0.5


def test_parity_with_duckdb_on_documents(spark):
    """Split documents by doc_id % 17: the 0-residue slice is the
    'benchmark', the rest the training corpus — both engines."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    t_src = "SELECT * FROM documents WHERE doc_id % 17 <> 0"
    b_src = "SELECT * FROM documents WHERE doc_id % 17 = 0"
    con = duckdb_con(SF_SMALL)

    got_p = benchmark_contamination_pairs(train, bench, n=8).toPandas()
    want_p = con.execute(oracle.contamination_pairs_sql(t_src, b_src, n=8)).fetchdf()
    assert len(got_p) > 0  # the synthetic corpus has cross-doc 8-gram dups
    assert compare(got_p, want_p) == []

    got_r = contamination_report(train, bench, n=8).toPandas()
    want_r = con.execute(oracle.contamination_report_sql(t_src, b_src, n=8)).fetchdf()
    assert len(got_r) > 0
    assert compare(got_r, want_r) == []


def test_plan_stays_jvm_side(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    plan = plan_of(benchmark_contamination_pairs(train, bench))
    for marker in ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, marker
