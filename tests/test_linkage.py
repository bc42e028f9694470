"""Bipartite record linkage (er.link_records): match/new decisions,
best-match tiebreak law, either-side hot-block cap, every-left-row
contract, and DuckDB parity (oracle.link_records_sql)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.er import blocking_keys, link_candidates, link_records

SCHEMA = "rec_id bigint, name string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_match_and_new_decisions(spark):
    left = _df(spark, [(1, "anna maria schmidt"), (2, "zzz completely unseen")])
    right = _df(spark, [(10, "anna maria schmitd"), (11, "john doe")])
    got = {r["id_l"]: (r["id_r"], r["decision"]) for r in
           link_records(left, right, "name", "name").collect()}
    assert got[1] == (10, "matched")
    assert got[2] == (None, "new")


def test_sorted_token_arm_catches_reordering(spark):
    left = _df(spark, [(1, "maria anna")])
    right = _df(spark, [(10, "anna maria")])
    got = link_records(left, right, "name", "name").collect()
    assert got[0]["id_r"] == 10 and got[0]["sim"] == 1.0


def test_best_match_tiebreak_is_lowest_right_id(spark):
    left = _df(spark, [(1, "abcdef gh")])
    right = _df(spark, [(20, "abcdef gh"), (10, "abcdef gh")])
    got = link_records(left, right, "name", "name").collect()
    assert got[0]["id_r"] == 10  # equal sims → lowest id wins


def test_every_left_row_present_exactly_once(spark):
    rng = random.Random(5)
    left = _df(spark, [(i, f"name {rng.randint(0, 30):02d} x") for i in range(50)])
    right = _df(spark, [(100 + i, f"name {i:02d} x") for i in range(20)])
    out = link_records(left, right, "name", "name").collect()
    assert sorted(r["id_l"] for r in out) == list(range(50))


def test_hot_block_cap_either_side(spark):
    # 100 identical right names share every block key → hot on the right
    # side alone must exclude the key (fan-out is left×right)
    left = _df(spark, [(1, "aaa bbb")])
    right = _df(spark, [(10 + i, "aaa bbb") for i in range(100)])
    lk = link_candidates(
        blocking_keys(left, "name"),
        blocking_keys(right, "name"),
        max_block=50,
    )
    assert lk.count() == 0
    # and link_records then reports the left row as new, not an error
    got = link_records(left, right, "name", "name", max_block=50).collect()
    assert got[0]["decision"] == "new"


def test_duckdb_oracle_parity(spark):
    import duckdb

    from tests.parity import compare

    rng = random.Random(17)

    def nm(i, flip=False):
        import hashlib

        a = hashlib.md5(str(i).encode()).hexdigest()[:5]
        b = hashlib.md5((str(i) + "x").encode()).hexdigest()[:5]
        return f"{b} {a}" if flip else f"{a} {b}"

    # rights = canonical names; lefts = typo'd / reordered / novel
    right_rows = [(100 + i, nm(i)) for i in range(60)]
    left_rows = []
    for i in range(60):
        r = rng.random()
        if r < 0.4:
            left_rows.append((i, nm(i)[:-1] + "z"))   # typo arm
        elif r < 0.6:
            left_rows.append((i, nm(i, flip=True)))   # reorder arm
        else:
            left_rows.append((i, f"novel{i} token{i}"))
    spark_pdf = link_records(
        _df(spark, left_rows), _df(spark, right_rows), "name", "name", threshold=0.85
    ).toPandas()

    def cte(rows):
        vals = ", ".join(f"({i}, '{n}')" for i, n in rows)
        return f"SELECT * FROM (VALUES {vals}) t(rec_id, name)"

    sql = oracle.link_records_sql(cte(left_rows), cte(right_rows), threshold=0.85)
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems


def test_suffix_key_catches_early_typo(spark):
    # a typo in the FIRST characters kills the prefix key at every width
    # and these names' initials collide with nothing — only the mirror
    # suffix key can candidate this pair
    left = _df(spark, [(1, "xbcdefgh klmnop")])
    right = _df(spark, [(10, "abcdefgh klmnop")])
    no_suffix = link_records(left, right, "name", "name", prefix_len=5).collect()
    assert no_suffix[0]["decision"] == "new"
    with_suffix = link_records(
        left, right, "name", "name", prefix_len=5, suffix_len=5
    ).collect()
    assert with_suffix[0]["id_r"] == 10 and with_suffix[0]["decision"] == "matched"


def test_suffix_arm_duckdb_parity(spark):
    import duckdb

    from tests.parity import compare

    left_rows = [(1, "xbcde fghij"), (2, "abcde fghij"), (3, "zz yy")]
    right_rows = [(10, "abcde fghij"), (11, "qq ww")]
    spark_pdf = link_records(
        _df(spark, left_rows), _df(spark, right_rows), "name", "name",
        threshold=0.85, prefix_len=5, suffix_len=5,
    ).toPandas()

    def cte(rows):
        vals = ", ".join(f"({i}, '{n}')" for i, n in rows)
        return f"SELECT * FROM (VALUES {vals}) t(rec_id, name)"

    sql = oracle.link_records_sql(
        cte(left_rows), cte(right_rows), threshold=0.85, prefix_len=5, suffix_len=5
    )
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems


def test_plan_no_cartesian_and_group_limit(spark):
    left = _df(spark, [(i, f"nm{i:03d} tok") for i in range(40)])
    right = _df(spark, [(100 + i, f"nm{i:03d} tok") for i in range(40)])
    out = link_records(left, right, "name", "name")
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # the rank<=1 best-match cut rides WindowGroupLimit, not a full sort+filter
    assert "WindowGroupLimit" in plan, plan
