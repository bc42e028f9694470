"""Text→vector hashing-trick embedding (corpus.hashed_embedding):
hand-computed law, multiset/order semantics, partitioning invariance,
composition with the vector stack, and DuckDB parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.corpus import hashed_embedding
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _law(token: str, dim: int, salt: str = "emb-v1"):
    import hashlib

    h = hashlib.md5(f"{salt}|{token}".encode()).hexdigest()
    bucket = int(h[:12], 16) % dim
    sign = 1 if int(h[12], 16) % 2 == 0 else -1
    return bucket, sign


def test_hand_computed_vector(spark):
    dim = 8
    rows = _docs(spark, [(1, "alpha beta alpha")])
    vec = hashed_embedding(rows, "text", "doc_id", dim=dim).collect()[0].vec
    want = [0] * dim
    for t in ("alpha", "beta", "alpha"):  # multiset: alpha counts twice
        b, s = _law(t, dim)
        want[b] += s
    assert list(vec) == want
    assert sum(abs(v) for v in vec) >= 1


def test_order_invariant_and_multiset(spark):
    a = hashed_embedding(_docs(spark, [(1, "x y z")]), "text", "doc_id", dim=16).collect()[0].vec
    b = hashed_embedding(_docs(spark, [(1, "z x y")]), "text", "doc_id", dim=16).collect()[0].vec
    assert list(a) == list(b)
    c = hashed_embedding(_docs(spark, [(1, "x x y z")]), "text", "doc_id", dim=16).collect()[0].vec
    assert list(c) != list(a)


def test_partitioning_invariant_and_empty_docs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}") for i in range(200)] + [
        (999, "   ...   ")
    ]
    df = _docs(spark, rows)
    a = {r.doc_id: list(r.vec) for r in hashed_embedding(df, "text", "doc_id").collect()}
    b = {
        r.doc_id: list(r.vec)
        for r in hashed_embedding(df.repartition(13), "text", "doc_id").collect()
    }
    assert a == b
    assert 999 not in a  # no-token doc emits nothing
    assert len(a) == 200


def test_guard(spark):
    with pytest.raises(ValueError):
        hashed_embedding(_docs(spark, [(1, "a")]), "text", "doc_id", dim=0)


def test_composes_with_vector_stack(spark):
    """The output feeds embedding_covariance directly (integer arrays
    cast clean) — the text on-ramp claim."""
    from etl_scripts_spark.operators.similarity import embedding_covariance

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(300)
    emb = hashed_embedding(docs, "text", "doc_id", dim=8)
    cov = embedding_covariance(
        emb.select("doc_id", F.col("vec").cast("array<float>").alias("embedding")),
        "embedding",
        grid=1,
    )
    rows = cov.collect()
    assert len(rows) == 8 * 9 // 2
    assert all(r.cov is not None for r in rows)


def test_parity_with_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = hashed_embedding(docs, "text", "doc_id", dim=32).toPandas()
    got["vec"] = got["vec"].map(lambda v: ",".join(str(int(x)) for x in v))
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        "SELECT doc_id, array_to_string(vec, ',') AS vec FROM ("
        + oracle.hashed_embedding_sql("SELECT doc_id, text FROM documents", dim=32)
        + ")"
    ).fetchdf()
    assert len(want) > 0
    assert compare(got, want) == []
