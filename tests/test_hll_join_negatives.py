"""HLL join-cardinality estimation (sketch.hll_join_estimate) and
deterministic contrastive negative mining (sampling.contrastive_negatives):
accuracy envelopes, algebraic laws, determinism, exclusion, and DuckDB
parity for the estimator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.sampling import contrastive_negatives
from etl_scripts_spark.operators.sketch import (
    hll_join_estimate,
    hll_merge,
    hll_registers,
)
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def _keyed(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.col("id").cast("string").alias("v")
    )


def test_join_estimate_accuracy_on_planted_overlap(spark):
    # |A| = 20k (0..20k), |B| = 20k (10k..30k), true ∩ = 10k, ∪ = 30k
    a = hll_registers(_keyed(spark, 0, 20_000), "grp", "v")
    b = hll_registers(_keyed(spark, 10_000, 30_000), "grp", "v")
    r = hll_join_estimate(a, b, "grp").collect()[0]
    # HLL at p=12 is ~1.6% rsd per estimate; inclusion-exclusion sums
    # three — allow a generous 4-sigma envelope on each quantity
    assert abs(r.est_a - 20_000) < 1_600
    assert abs(r.est_b - 20_000) < 1_600
    assert abs(r.est_union - 30_000) < 2_400
    assert abs(r.est_intersection - 10_000) < 4_000
    assert abs(r.est_jaccard - 1 / 3) < 0.15


def test_join_estimate_disjoint_clamps_at_zero(spark):
    a = hll_registers(_keyed(spark, 0, 5_000), "grp", "v")
    b = hll_registers(_keyed(spark, 100_000, 105_000), "grp", "v")
    r = hll_join_estimate(a, b, "grp").collect()[0]
    assert r.est_intersection >= 0.0
    assert r.est_intersection < 1_500  # noise only


def test_join_estimate_null_group_survives(spark):
    # hll_registers keeps NULL groups (it filters NULL VALUES only);
    # the estimate joins must be null-safe or the NULL partition's
    # sides silently zero
    def side(lo, hi):
        return spark.range(lo, hi).select(
            F.lit(None).cast("string").alias("grp"),
            F.col("id").cast("string").alias("v"),
        )

    a = hll_registers(side(0, 4_000), "grp", "v")
    b = hll_registers(side(2_000, 6_000), "grp", "v")
    r = hll_join_estimate(a, b, "grp").collect()[0]
    assert r.grp is None
    assert r.est_a > 3_000 and r.est_b > 3_000
    assert r.est_intersection > 500  # true overlap 2k — must not clamp to 0


def test_join_estimate_one_sided_groups(spark):
    a = hll_registers(_keyed(spark, 0, 3_000, "only_a"), "grp", "v")
    b = hll_registers(_keyed(spark, 0, 3_000, "only_b"), "grp", "v")
    rows = {r.grp: r for r in hll_join_estimate(a, b, "grp").collect()}
    assert set(rows) == {"only_a", "only_b"}
    assert rows["only_a"].est_b == 0.0 and rows["only_a"].est_intersection == 0.0
    assert rows["only_b"].est_a == 0.0 and rows["only_b"].est_intersection == 0.0


def test_join_estimate_union_equals_merge_estimate(spark):
    """est_union must be EXACTLY hll_estimate(hll_merge(a, b)) — the
    algebraic identity the op is built on."""
    from etl_scripts_spark.operators.sketch import hll_estimate

    a = hll_registers(_keyed(spark, 0, 8_000), "grp", "v")
    b = hll_registers(_keyed(spark, 4_000, 12_000), "grp", "v")
    got = hll_join_estimate(a, b, "grp").collect()[0].est_union
    want = hll_estimate(hll_merge(a, b, "grp"), "grp").collect()[0].hll_distinct
    assert got == want


def test_join_estimate_parity_with_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a_df = docs.filter(F.col("doc_id") % 3 != 0).select(
        "source", F.col("lang").cast("string").alias("v")
    )
    b_df = docs.filter(F.col("doc_id") % 2 != 0).select(
        "source", F.col("lang").cast("string").alias("v")
    )
    got = hll_join_estimate(
        hll_registers(a_df, "source", "v"),
        hll_registers(b_df, "source", "v"),
        "source",
    ).toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.hll_join_estimate_sql(
            "SELECT source, lang AS v FROM documents WHERE doc_id % 3 <> 0",
            "SELECT source, lang AS v FROM documents WHERE doc_id % 2 <> 0",
            "source",
            "v",
        )
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []


# ------------------------------------------------ contrastive negatives


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_negatives_shape_and_rank(spark):
    out = contrastive_negatives(_docs(spark, 500), "doc_id", k=3, n_shards=4)
    rows = out.collect()
    # every anchor appears; tails may have < k negatives
    per_anchor = {}
    for r in rows:
        assert r.anchor_id != r.negative_id
        assert 1 <= r.neg_rank <= 3
        per_anchor.setdefault(r.anchor_id, set()).add(r.neg_rank)
    assert len(per_anchor) >= 488  # only the ≤3-row tail of each of 4 shards misses
    full = [a for a, ranks in per_anchor.items() if ranks == {1, 2, 3}]
    assert len(full) >= 488


def test_negatives_deterministic_and_salt_independent(spark):
    df = _docs(spark, 300)
    a = sorted((r.anchor_id, r.negative_id, r.neg_rank) for r in contrastive_negatives(df, "doc_id", k=2).collect())
    b = sorted((r.anchor_id, r.negative_id, r.neg_rank) for r in contrastive_negatives(df.repartition(11), "doc_id", k=2).collect())
    assert a == b
    c = sorted((r.anchor_id, r.negative_id, r.neg_rank) for r in contrastive_negatives(df, "doc_id", k=2, salt="neg-v2").collect())
    assert c != a  # an independent draw


def test_negatives_exclusion_removes_both_orientations(spark):
    df = _docs(spark, 200)
    base = contrastive_negatives(df, "doc_id", k=4, n_shards=2)
    some = base.limit(5).collect()
    ex = [(r.anchor_id, r.negative_id) for r in some[:3]] + [
        (some[3].negative_id, some[3].anchor_id)  # reversed orientation
    ]
    exdf = spark.createDataFrame(ex, "id_a long, id_b long")
    pruned = contrastive_negatives(df, "doc_id", k=4, n_shards=2, exclude=exdf)
    got = {(r.anchor_id, r.negative_id) for r in pruned.collect()}
    for a_, b_ in ex:
        assert (a_, b_) not in got and (b_, a_) not in got


def test_negatives_duplicate_ids_never_self_pair(spark):
    dup = spark.createDataFrame(
        [(i % 50,) for i in range(150)], "doc_id long"
    )  # every id three times
    out = contrastive_negatives(dup, "doc_id", k=3, n_shards=2).collect()
    assert all(r.anchor_id != r.negative_id for r in out)
    # and the pair set equals the deduped input's pair set
    ded = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    want = sorted(
        (r.anchor_id, r.negative_id, r.neg_rank)
        for r in contrastive_negatives(ded, "doc_id", k=3, n_shards=2).collect()
    )
    got = sorted((r.anchor_id, r.negative_id, r.neg_rank) for r in out)
    assert got == want


def test_negatives_guards(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        contrastive_negatives(df, "doc_id", k=0)
    with pytest.raises(ValueError):
        contrastive_negatives(df, "doc_id", n_shards=0)
