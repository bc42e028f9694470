"""Sentence segmentation (text.segment_sentences): order + trim + count
law, no-content docs emit nothing, map-only plan, and DuckDB parity
(oracle.segment_sentences_sql — the RE2-safe regex agreement)."""

from __future__ import annotations

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.text import segment_sentences


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_segmentation_law(spark):
    rows = segment_sentences(_docs(spark, ["Hello there. How are you?! ok"])).collect()
    got = [(r["sent_idx"], r["sentence"], r["n_ws_tokens"]) for r in rows]
    assert got == [(0, "Hello there.", 2), (1, "How are you?!", 3), (2, "ok", 1)]


def test_no_content_emits_nothing(spark):
    out = segment_sentences(_docs(spark, ["", "..!", "   "]))
    assert out.count() == 0


def test_map_only_plan(spark):
    out = segment_sentences(_docs(spark, ["a. b."]))
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    texts = [
        "Hello there. How are you?! Fine... ok",
        "no terminators here",
        "",
        "..!",
        "a.b",
        "Dr. Smith went. Then left.",
        "  spaced   out .  tokens  ",
    ]
    spark_pdf = segment_sentences(_docs(spark, texts)).toPandas()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    sql = oracle.segment_sentences_sql(f"SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
