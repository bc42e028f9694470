"""Exact distributed covariance + PCA (similarity.embedding_covariance /
pca_components / pca_project): hand-computed moments, partitioning
invariance of the exact integer core, numpy reference parity for the
eigen stage, DuckDB parity on the real embeddings table, and guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.similarity import (
    embedding_covariance,
    pca_components,
    pca_project,
)
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con, plan_of


def _vecs(spark, rows, parts=None):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )
    return df.repartition(parts) if parts else df


def test_covariance_hand_computed(spark):
    # x = [1,2,3], y = [1,3,5]: var(x)=2/3, var(y)=8/3, cov=4/3 (population)
    df = _vecs(spark, [[1.0, 1.0], [2.0, 3.0], [3.0, 5.0]])
    got = {(r.i, r.j): r for r in embedding_covariance(df, "embedding").collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 2)}
    assert got[(1, 1)].cov == round(2 / 3, 9)
    assert got[(2, 2)].cov == round(8 / 3, 9)
    assert got[(1, 2)].cov == round(4 / 3, 9)
    assert got[(1, 2)].n == 3
    assert got[(1, 2)].mean_i == 2.0 and got[(1, 2)].mean_j == 3.0


def test_covariance_partitioning_invariant(spark):
    rng = np.random.RandomState(7)
    rows = rng.randn(200, 4).tolist()
    a = embedding_covariance(_vecs(spark, rows, parts=1), "embedding").toPandas()
    b = embedding_covariance(_vecs(spark, rows, parts=13), "embedding").toPandas()
    key = lambda d: d.sort_values(["i", "j"]).reset_index(drop=True)
    assert key(a).equals(key(b))


def test_covariance_null_vectors_dropped(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = embedding_covariance(df, "embedding").collect()
    assert all(r.n == 2 for r in rows)


def test_covariance_guards(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(ValueError):
        embedding_covariance(_vecs(spark, [[1.0]]), "embedding", grid=0)
    # mixed dims raise in-plan
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception) as e:
        embedding_covariance(mixed, "embedding").collect()
    assert "mixed vector lengths" in str(e.value)
    # NaN components raise in-plan
    nan = spark.createDataFrame(
        [(1, [1.0, float("nan")])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception) as e:
        embedding_covariance(nan, "embedding").collect()
    assert "NaN/Inf" in str(e.value)
    # dim cap raises in-plan
    wide = _vecs(spark, [list(range(10))])
    with pytest.raises(Exception) as e:
        embedding_covariance(wide, "embedding", max_dim=4).collect()
    assert "max_dim" in str(e.value)
    # a NULL COMPONENT (not a NULL vector) raises — it would otherwise
    # vanish from sum() while count() still counts the row
    nullcomp = spark.createDataFrame(
        [(1, [1.0, None]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception) as e:
        embedding_covariance(nullcomp, "embedding").collect()
    assert "NULL/NaN/Inf" in str(e.value)


def test_covariance_empty_vectors_dropped_and_empty_cov_yields_no_components(spark):
    # empty arrays drop like NULL vectors (oracle's generate_series skips them)
    df = spark.createDataFrame(
        [(1, []), (2, [1.0, 2.0]), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = embedding_covariance(df, "embedding").collect()
    assert all(r.n == 2 for r in rows)
    # all-NULL input -> empty covariance -> pca_components emits nothing
    allnull = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    cov = embedding_covariance(allnull, "embedding")
    assert pca_components(cov, k=2).count() == 0


def test_project_raises_on_null_vector_and_dim_mismatch(spark):
    base = _vecs(spark, [[1.0, 2.0, 3.0], [2.0, 1.0, 0.0], [0.5, 0.5, 1.0]])
    comps = pca_components(embedding_covariance(base, "embedding"), k=1)
    withnull = spark.createDataFrame(
        [(9, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception) as e:
        pca_project(withnull, "embedding", "vec_id", comps).collect()
    assert "NULL vector or dimension mismatch" in str(e.value)
    short = _vecs(spark, [[1.0, 2.0]])
    with pytest.raises(Exception) as e:
        pca_project(short, "embedding", "vec_id", comps).collect()
    assert "dimension mismatch" in str(e.value)


def test_covariance_parity_with_duckdb(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = embedding_covariance(emb, "embedding").toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.embedding_covariance_sql("SELECT embedding FROM embeddings")
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []


def test_covariance_nine_dp_tie_is_engine_exact(spark):
    """Regression for the r11 sf0.1 find: when the true mean terminates
    at exactly 10 decimal digits ending in 5 (n·grid = 2·10⁹ here), a
    float round(x, 9) is ENGINE-DIVERGENT — Spark's BigDecimal rounds
    the binary double (just below .5) down, DuckDB's multiply-based
    round lands on .5 and rounds away.  The exact-integer e9 law must
    give round-half-AWAY on the true rational value in both engines,
    for both signs."""
    import duckdb

    # two 1-dim vectors, grid 1e9: snapped sum ±3 → true mean ±1.5e-9,
    # a dead-center 9-dp tie → half-away = ±2e-9
    for sign in (1.0, -1.0):
        df = _vecs(spark, [[0.0], [sign * 3e-9]])
        got = embedding_covariance(df, "embedding", grid=10**9).toPandas()
        assert len(got) == 1
        assert got["mean_i"][0] == sign * 2e-9, got["mean_i"][0]
        want = duckdb.sql(
            oracle.embedding_covariance_sql(
                f"SELECT v AS embedding FROM (VALUES ([0.0]), ([{sign * 3e-9}])) t(v)",
                grid=10**9,
            )
        ).fetchdf()
        assert compare(got, want) == []
        assert want["mean_i"][0] == sign * 2e-9


def test_diagonal_covariance_shares_the_e9_law(spark):
    """standardize_embeddings' contract is that its default diagonal
    statistics equal the full embedding_covariance's — which requires
    the diagonal path to use the SAME exact-e9 rounding (a float round
    there diverges on the tie fixture: 1e-9 vs the exact 2e-9)."""
    from etl_scripts_spark.operators.similarity import _diagonal_covariance

    df = _vecs(spark, [[0.0], [3e-9]])
    full = embedding_covariance(df, "embedding", grid=10**9).toPandas()
    diag = _diagonal_covariance(df, "embedding", grid=10**9).toPandas()
    assert diag["mean_i"][0] == full["mean_i"][0] == 2e-9
    assert diag["cov"][0] == full["cov"][0]


def test_pca_matches_numpy_reference(spark):
    """Planted 2-factor structure in 4 dims: components and explained
    variance must match numpy PCA on the identical snapped data."""
    rng = np.random.RandomState(3)
    f1 = rng.randn(300)
    f2 = rng.randn(300)
    x = np.stack(
        [3 * f1, 3 * f1 + 0.1 * rng.randn(300), f2, f2 + 0.1 * rng.randn(300)],
        axis=1,
    )
    df = _vecs(spark, x.tolist())
    cov = embedding_covariance(df, "embedding")
    comps = pca_components(cov, k=2).collect()
    assert [c.component for c in comps] == [1, 2]
    # numpy reference over the SAME rounded covariance the op produced
    cells = {(r.i, r.j): r.cov for r in cov.collect()}
    d = 4
    m = np.zeros((d, d))
    for (i, j), v in cells.items():
        m[i - 1, j - 1] = m[j - 1, i - 1] = v
    evals, evecs = np.linalg.eigh(m)
    order = np.argsort(evals)[::-1]
    for rank, col in zip(range(2), order):
        v = evecs[:, col]
        if v[np.abs(v).argmax()] < 0:
            v = -v
        got_v = np.array(comps[rank].vector)
        assert np.allclose(got_v, v, atol=1e-8)
        assert comps[rank].eigenvalue == round(float(evals[col]), 9)
    # the two planted factors explain ~everything
    assert sum(c.explained_variance_ratio for c in comps) > 0.99


def test_pca_project_centers_and_scores(spark):
    """Projection = dot(x - mean, v): verify against a direct numpy
    computation using the op's own components."""
    rng = np.random.RandomState(5)
    x = rng.randn(50, 3) * np.array([5.0, 1.0, 0.2]) + np.array([10.0, -4.0, 2.0])
    df = _vecs(spark, x.tolist())
    cov = embedding_covariance(df, "embedding")
    comps = pca_components(cov, k=2)
    rows = {r.vec_id: r.proj for r in pca_project(df, "embedding", "vec_id", comps).collect()}
    cl = comps.collect()
    xs = np.array([np.array(v, dtype=np.float64) for v in x])
    for rid, proj in rows.items():
        for c in cl:
            want = float(np.dot(xs[rid].astype(np.float32).astype(np.float64), c.vector) - c.offset)
            assert abs(proj[c.component - 1] - want) < 1e-6
    assert all(len(p) == 2 for p in rows.values())


def test_project_plan_is_catalyst_only(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cov = embedding_covariance(emb, "embedding")
    comps = pca_components(cov, k=2)
    plan = plan_of(pca_project(emb, "embedding", "vec_id", comps))
    # the single-row eigen stage is the only Python; the corpus-sized
    # projection side of the plan must not re-enter Python per row —
    # its FlatMapsInPandas input is the 1-row covariance aggregate
    assert plan.count("FlatMapGroupsInPandas") == 0
    assert "CartesianProduct" not in plan


def test_standardize_hand_computed(spark):
    from etl_scripts_spark.operators.similarity import standardize_embeddings

    # dim0: values 1,2,3 -> mean 2, var 2/3; dim1 constant -> std 0 -> z=0
    df = _vecs(spark, [[1.0, 5.0], [2.0, 5.0], [3.0, 5.0]])
    rows = {r.vec_id: list(r.vec)
            for r in standardize_embeddings(df, "embedding", "vec_id").collect()}
    import math

    std0 = math.sqrt(round(2 / 3, 9))
    assert rows[0][0] == round((1 - 2) / std0, 6)
    assert rows[1][0] == 0.0
    assert rows[2][0] == round((3 - 2) / std0, 6)
    assert all(v[1] == 0.0 for v in rows.values())


def test_standardize_reuses_cov_and_guards(spark):
    from etl_scripts_spark.operators.similarity import standardize_embeddings

    df = _vecs(spark, [[1.0, 2.0], [3.0, 4.0], [5.0, 7.0]])
    cov = embedding_covariance(df, "embedding")
    a = {r.vec_id: list(r.vec) for r in standardize_embeddings(df, "embedding", "vec_id", cov_long=cov).collect()}
    b = {r.vec_id: list(r.vec) for r in standardize_embeddings(df.repartition(5), "embedding", "vec_id").collect()}
    assert a == b  # partitioning-invariant statistics -> identical output
    # dim mismatch between vectors and statistics raises in-plan
    other = _vecs(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(Exception) as e:
        standardize_embeddings(other, "embedding", "vec_id", cov_long=cov).collect()
    assert "dimension mismatch" in str(e.value)


def test_standardize_ragged_input_raises_at_stats_stage(spark):
    """The diagonal statistics path carries the same mixed-dims guard as
    embedding_covariance: ragged vectors raise at the statistics pass,
    not later (and not silently as per-dimension stats over different
    populations)."""
    from etl_scripts_spark.operators.similarity import standardize_embeddings

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0]), (3, [4.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception) as e:
        standardize_embeddings(mixed, "embedding", "vec_id").collect()
    assert "mixed vector lengths" in str(e.value)


def test_standardize_nan_component_raises_even_with_reused_cov(spark):
    from etl_scripts_spark.operators.similarity import standardize_embeddings

    clean = _vecs(spark, [[1.0, 2.0], [3.0, 4.0], [5.0, 7.0]])
    cov = embedding_covariance(clean, "embedding")
    dirty = spark.createDataFrame(
        [(9, [1.0, float("nan")])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception) as e:
        standardize_embeddings(dirty, "embedding", "vec_id", cov_long=cov).collect()
    assert "NULL/NaN" in str(e.value)
