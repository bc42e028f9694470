"""Plan pins for the late-r8 banked operators: no Python in any
corpus-sized stage, and no nested-loop joins outside the declared 1-row
attach shapes.  One place to catch a regression that silently drops an
operator out of whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.catalog import normalize_events
from etl_scripts_spark.operators.corpus import hashed_embedding
from etl_scripts_spark.operators.dedup import setsim_pairs
from etl_scripts_spark.operators.sampling import (
    contrastive_negatives,
    stratified_sample,
)
from etl_scripts_spark.operators.similarity import embedding_covariance
from etl_scripts_spark.operators.sketch import hll_join_estimate, hll_registers
from etl_scripts_spark.operators.skew import key_skew_report
from etl_scripts_spark.operators.windows import hopping_rollup
from etl_scripts_spark.reports.anomaly import mad_outliers
from etl_scripts_spark.reports.attribution import attribute_conversions
from tests.conftest import SF_SMALL
from tests.parity import plan_of


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_no_python_in_any_banked_corpus_stage(spark):
    docs = _docs(spark)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    ev = normalize_events(spark.read.parquet(f"{SF_SMALL}/events.parquet"))
    regs = hll_registers(
        docs.select("source", F.col("lang").alias("v")), "source", "v"
    )
    plans = {
        "setsim": plan_of(setsim_pairs(docs, "text", "doc_id")),
        "covariance": plan_of(embedding_covariance(emb, "embedding")),
        "mad": plan_of(mad_outliers(docs.select("doc_id", "n_chars"), "n_chars")),
        "stratified": plan_of(stratified_sample(docs, 50, "source", "doc_id")),
        "negatives": plan_of(contrastive_negatives(docs, "doc_id", k=3)),
        "hll_join": plan_of(hll_join_estimate(regs, regs, "source")),
        "hashed_emb": plan_of(hashed_embedding(docs, "text", "doc_id", dim=16)),
        "skew": plan_of(key_skew_report(docs, "source")),
        "attribution": plan_of(attribute_conversions(ev, lookback_s=3600)),
        "hopping": plan_of(hopping_rollup(ev, 3600, 900, value_col="value")),
    }
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # nested-loop only in the declared 1-row attach shapes
    for name in ("setsim", "covariance", "negatives", "hashed_emb",
                 "attribution", "hopping", "hll_join"):
        assert "BroadcastNestedLoopJoin" not in plans[name], name


def test_negatives_single_window_sort(spark):
    """All k lead taps must share ONE window sort — k separate sorts
    would re-shuffle per tap."""
    plan = plan_of(contrastive_negatives(_docs(spark), "doc_id", k=4))
    assert plan.count("Window") <= 2  # one Window node (+ possible header echo)
