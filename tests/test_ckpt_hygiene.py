"""Eager localCheckpoint release (etl_scripts_spark/ckpt.py).

The iterative operators checkpoint per-round state; before this fix every
superseded round's blocks stayed pinned until JVM GC, and SCALE.md measured
a later operator inflating ~4x under the retained pressure (the
diameter-100 chain CC query was the worst producer).  These tests pin BOTH
sides of the contract: superseded rounds are freed promptly, and the
checkpoint a result actually reads is never freed (the result stays
collectable AFTER the free pass, with correct values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.ckpt import free_local_checkpoint
from etl_scripts_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from etl_scripts_spark.operators.graph import k_core, pagerank


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def chain_pairs(spark, n: int):
    return spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def test_free_is_a_noop_on_non_checkpoint_plans(spark):
    df = spark.range(10).select("id", (F.col("id") * 2).alias("x"))
    free_local_checkpoint(df)  # must not raise
    free_local_checkpoint(None)
    assert df.count() == 10


def test_free_actually_releases_blocks(spark):
    before = _n_persistent(spark)
    cp = spark.range(100).localCheckpoint(eager=True)
    assert _n_persistent(spark) == before + 1
    free_local_checkpoint(cp)
    assert _n_persistent(spark) == before


def test_star_cc_frees_every_superseded_round(spark):
    # a 60-node chain forces many star rounds; each used to leave one
    # pinned edge checkpoint behind
    before = _n_persistent(spark)
    out = connected_components_star(chain_pairs(spark, 60))
    leaked = _n_persistent(spark) - before
    # only the final edge checkpoint (which the result reads) may remain
    assert leaked <= 1, f"star-CC retained {leaked} checkpoints"
    # and that surviving checkpoint must still be readable: one component
    rows = out.toPandas()
    assert set(rows["component"]) == {0}
    assert len(rows) == 60


def test_label_prop_cc_frees_rounds_and_keeps_result_live(spark):
    before = _n_persistent(spark)
    out = connected_components(chain_pairs(spark, 12), max_iter=20)
    leaked = _n_persistent(spark) - before
    assert leaked <= 1, f"label-prop CC retained {leaked} checkpoints"
    rows = out.toPandas()
    assert set(rows["component"]) == {0}
    assert len(rows) == 12


def test_pagerank_frees_rounds_and_keeps_result_live(spark):
    edges = spark.range(20).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 20).alias("dst")
    )
    before = _n_persistent(spark)
    out = pagerank(edges, rounds=4)
    leaked = _n_persistent(spark) - before
    # 4 = the edges/nodes/deg input materializations (live under the
    # returned plan BY DESIGN — they stop per-round re-scans of the edge
    # source) + the final round's rank checkpoint.  The per-round leak
    # this test exists to catch would add one more per extra round.
    assert leaked <= 4, f"pagerank retained {leaked} checkpoints"
    rows = out.toPandas()
    # 20-cycle: every node has in/out degree 1 → identical ranks
    assert len(set(rows["rank"])) == 1
    assert len(rows) == 20


def test_k_core_frees_rounds_and_keeps_result_live(spark):
    # triangle (survives k=2) + a pendant chain that peels over 3 rounds
    tri = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(tri, "src bigint, dst bigint")
    before = _n_persistent(spark)
    out = k_core(edges, k=2, max_iter=10)
    leaked = _n_persistent(spark) - before
    assert leaked <= 1, f"k_core retained {leaked} checkpoints"
    rows = out.toPandas().sort_values("node")
    assert list(rows["node"]) == [0, 1, 2]
    assert list(rows["degree"]) == [2, 2, 2]
