"""Bloom-filter join pruning (operators/sketch.py bloom_*): the
no-false-negative guarantee, exact equality with a plain semi join,
map-side-only pruning (zero exchanges on the fact side), real cuts on
disjoint keys, and partitioning-independence of the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.operators.sketch import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


def _tbl(spark, ids):
    return spark.createDataFrame([(f"k{i}",) for i in ids], "key string")


def test_bloom_no_false_negatives(spark):
    """Every true key survives pruning — the Bloom guarantee the final
    semi join relies on."""
    keys = _tbl(spark, range(100))
    big = _tbl(spark, range(1000))
    words = bloom_build(keys, "key", m_bits=1 << 16)
    got = {r["key"] for r in bloom_prune(big, "key", words, m_bits=1 << 16).collect()}
    assert {f"k{i}" for i in range(100)} <= got


def test_bloom_semi_join_equals_plain_semi(spark):
    """bloom_semi_join is EXACT: the Bloom stage only cuts shuffle input,
    the trailing semi join kills every false positive."""
    keys = _tbl(spark, range(0, 600, 3))
    big = _tbl(spark, range(500)).withColumn("payload", F.length("key"))
    want = sorted(
        (r["key"], r["payload"])
        for r in big.join(keys, "key", "left_semi").collect()
    )
    got = sorted(
        (r["key"], r["payload"])
        for r in bloom_semi_join(big, keys, "key", m_bits=1 << 16).collect()
    )
    assert got == want and len(got) == 167  # k0, k3, ..., k498


def test_bloom_prune_is_map_side(spark):
    """The pruning stage adds NO shuffle on the fact side: k broadcast
    semi joins only — it composes under the caller's partitioning."""
    import contextlib
    import io

    keys = _tbl(spark, range(50))
    big = _tbl(spark, range(400))
    words = bloom_build(keys, "key").localCheckpoint(eager=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bloom_prune(big, "key", words).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # the qualified form appears once per join in the plan tree
    assert plan.count("BroadcastHashJoin LeftSemi") == 3


def test_bloom_cuts_disjoint_keys(spark):
    """Disjoint fact keys mostly vanish map-side: with n=200, m=2^16,
    k=3 the false-positive rate is ~(1-e^(-kn/m))^3 < 1e-6 — far under
    the 5% this asserts (deterministic law, not a flaky sample)."""
    keys = _tbl(spark, range(200))
    big = _tbl(spark, range(10_000, 11_000))
    words = bloom_build(keys, "key", m_bits=1 << 16)
    n = bloom_prune(big, "key", words, m_bits=1 << 16).count()
    assert n < 50


def test_bloom_prune_partitioning_independent(spark):
    """Same survivors under any input partitioning — the law is per-row."""
    keys = _tbl(spark, range(64))
    big = _tbl(spark, range(300))
    words = bloom_build(keys, "key")
    a = sorted(r["key"] for r in bloom_prune(big.repartition(13), "key", words).collect())
    b = sorted(r["key"] for r in bloom_prune(big.coalesce(1), "key", words).collect())
    assert a == b


def test_bloom_prune_rejects_temp_name_collision(spark):
    import pytest as _pt

    keys = _tbl(spark, range(10))
    big = _tbl(spark, range(20)).withColumn("_p1", F.lit(0))
    words = bloom_build(keys, "key")
    with _pt.raises(ValueError, match="collide"):
        bloom_prune(big, "key", words)


def test_bloom_survivors_match_duckdb_position_law(spark):
    """DuckDB recomputes the pruning set from the position law alone —
    a probe key survives iff ALL k of its bit positions are set by some
    filter key (equivalent to the packed-word formulation, no 64-bit
    shifts needed).  Pins the oracle for the upcoming registration."""
    import duckdb

    m, k = 1 << 16, 3
    keys = _tbl(spark, range(60))
    big = _tbl(spark, range(400))
    words = bloom_build(keys, "key", m_bits=m, k=k)
    got = sorted(
        r["key"] for r in bloom_prune(big, "key", words, m_bits=m, k=k).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE keys(key VARCHAR)")
    con.executemany("INSERT INTO keys VALUES (?)", [(f"k{i}",) for i in range(60)])
    con.execute("CREATE TABLE big(key VARCHAR)")
    con.executemany("INSERT INTO big VALUES (?)", [(f"k{i}",) for i in range(400)])
    pos = " UNION ALL ".join(
        f"SELECT key, ('0x' || substr(md5('bf{j}' || '|' || key), 1, 12))::BIGINT % {m} AS p"
        f" FROM {{t}}"
        for j in range(k)
    )
    sql = f"""
    WITH setbits AS (SELECT DISTINCT p FROM ({pos.format(t="keys")})),
    probe AS ({pos.format(t="big")})
    SELECT key FROM probe
    GROUP BY key
    HAVING count(*) FILTER (WHERE p IN (SELECT p FROM setbits)) = {k}
    ORDER BY key
    """
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == sorted(want)
