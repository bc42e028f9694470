"""Partitioning-invariance: distributed results must not depend on the
physical layout of the input.

The classic distributed-correctness bug is an operator whose output
changes with partition count or row order (non-commutative accumulation,
first/last without ordering, per-partition state leaking into results).
Every operator here is rerun under adversarial layouts — 1 partition vs
32, shuffled row order — and must produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _load_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_minhash_partitioning_invariance(spark):
    from etl_scripts_spark.operators.dedup import minhash_df

    docs = _load_docs(spark)
    cols = ["doc_id", "mh0", "mh1"]
    a = _rows(minhash_df(docs.coalesce(1), "text", "doc_id", num_hashes=2), cols)
    b = _rows(
        minhash_df(
            docs.repartition(32, F.col("doc_id") % 7), "text", "doc_id", num_hashes=2
        ),
        cols,
    )
    assert a == b


def test_connected_components_partitioning_invariance(spark):
    from etl_scripts_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (33, 0)],
        "id_a long, id_b long",
    )
    a = _rows(connected_components(pairs.coalesce(1)), ["id", "component"])
    b = _rows(
        connected_components(pairs.repartition(16, "id_b")), ["id", "component"]
    )
    assert a == b


def test_asof_join_partitioning_invariance(spark):
    from etl_scripts_spark.operators.asof import asof_join

    from etl_scripts_spark.catalog import load

    ev = load(spark, SF, "events")
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    cols = ["event_id", "ts_matched", "value_matched"]
    a = _rows(asof_join(left.coalesce(1), right.coalesce(1), on="ts", by="user_id"), cols)
    b = _rows(
        asof_join(
            left.repartition(16, "event_id"),
            right.orderBy(F.desc("ts")).repartition(8),
            on="ts",
            by="user_id",
        ),
        cols,
    )
    assert a == b


def test_numbering_partitioning_invariance(spark):
    """Sequential ID allocation (the reference's probe-loop replacement)
    must assign the same numbers regardless of layout — the window's
    explicit ordering, not arrival order, is the contract."""
    from etl_scripts_spark.operators.numbering import allocate_sequence

    df = spark.range(200).select(
        (F.col("id") % 9).alias("project"), F.col("id").alias("arrival")
    )
    existing = spark.createDataFrame(
        [(p, 100 * p) for p in range(9)], "project long, max_n long"
    )
    a = _rows(
        allocate_sequence(df.coalesce(1), existing, "project", ["arrival"]),
        ["project", "arrival", "n"],
    )
    b = _rows(
        allocate_sequence(
            df.repartition(32, "arrival"), existing.coalesce(1), "project", ["arrival"]
        ),
        ["project", "arrival", "n"],
    )
    assert a == b
