"""PMI collocations (corpus.pmi_collocations): hand-computed value law,
min_count pruning, whole-population NPMI NULL, staged-tokenizer plan
guard, and DuckDB parity (oracle.pmi_collocations_sql)."""

from __future__ import annotations

import math

import pytest

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.corpus import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_hand_computed_pmi(spark):
    # corpus: "a b" ×3 and "a c" ×1 → unigrams: a×4, b×3, c×1 (N_uni=8);
    # bigrams: (a,b)×3, (a,c)×1 (N_bi=4)
    df = _docs(spark, ["a b", "a b", "a b", "a c"])
    rows = {(r["w1"], r["w2"]): r for r in pmi_collocations(df, min_count=1).collect()}
    r = rows[("a", "b")]
    p_ab, p_a, p_b = 3 / 4, 4 / 8, 3 / 8
    assert r["c_ab"] == 3 and r["c_a"] == 4 and r["c_b"] == 3
    assert r["pmi"] == pytest.approx(round(math.log(p_ab / (p_a * p_b)), 9), abs=1e-12)
    assert r["npmi"] == pytest.approx(
        round(math.log(p_ab / (p_a * p_b)) / -math.log(p_ab), 9), abs=1e-12
    )


def test_min_count_prunes(spark):
    df = _docs(spark, ["a b", "a b", "a c"])
    pairs = {(r["w1"], r["w2"]) for r in pmi_collocations(df, min_count=2).collect()}
    assert pairs == {("a", "b")}


def test_whole_population_npmi_null(spark):
    df = _docs(spark, ["x y", "x y"])
    rows = pmi_collocations(df, min_count=1).collect()
    assert len(rows) == 1 and rows[0]["npmi"] is None
    # PMI itself is still defined: ln((1)/(0.5*0.5)) = ln 4
    assert rows[0]["pmi"] == pytest.approx(round(math.log(4), 9), abs=1e-12)


def test_tokenizer_not_inlined_into_hof(spark):
    df = _docs(spark, ["a b c"])
    out = pmi_collocations(df, min_count=1)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # the regexp tokenizer must run once in its own project, never per
    # HOF element (the repo-wide staging rule)
    assert "element_at(split(trim(regexp_replace" not in plan


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sleeps",
        "a quick brown cat jumps over the quick brown fox",
        "New York! new york, NEW york...",
        "one",
        "",
    ]
    spark_pdf = pmi_collocations(_docs(spark, texts), min_count=2).toPandas()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    sql = oracle.pmi_collocations_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", min_count=2
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
