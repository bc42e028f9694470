"""Forward as-of join (asof.asof_join_forward): brute-force equality on
randomized irregular series, inclusive-equality law, nulls-when-none,
and DuckDB native forward-ASOF parity."""

from __future__ import annotations

import random

from etl_scripts_spark.operators.asof import asof_join_forward


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_forward_matches_brute_force(spark):
    rng = random.Random(13)
    lrows = [(i, f"k{i % 3}", rng.randint(-50, 50)) for i in range(80)]
    # right timestamps UNIQUE per key: the as-of carry is documented
    # nondeterministic among equal (key, ts) right rows
    ts_pool = {k: rng.sample(range(-60, 60), 25) for k in ("k0", "k1", "k2")}
    rrows = [
        (100 + i, f"k{i % 3}", ts_pool[f"k{i % 3}"][i // 3], i * 10)
        for i in range(60)
    ]
    left = _mk(spark, lrows, "lid bigint, k string, ts bigint")
    right = _mk(spark, rrows, "rid bigint, k string, ts bigint, v bigint")
    got = {
        r["lid"]: (r["rid_matched"], r["ts_matched"])
        for r in asof_join_forward(left, right, on="ts", by="k").collect()
    }
    for lid, lk, lts in lrows:
        cands = [(rts, rid, v) for rid, rk, rts, v in rrows if rk == lk and rts >= lts]
        if cands:
            want = min(cands)
            assert got[lid][0] == want[1] and got[lid][1] == want[0]
        else:
            assert got[lid] == (None, None)


def test_inclusive_on_equality(spark):
    left = _mk(spark, [(1, "a", 10)], "lid bigint, k string, ts bigint")
    right = _mk(spark, [(9, "a", 10), (8, "a", 11)], "rid bigint, k string, ts bigint")
    got = asof_join_forward(left, right, on="ts", by="k").collect()
    assert got[0]["rid_matched"] == 9  # equality matches, like backward


def test_duckdb_native_forward_asof_parity(spark):
    import duckdb

    from tests.parity import compare

    rng = random.Random(19)
    lrows = [(i, f"k{i % 2}", rng.randint(0, 99)) for i in range(50)]
    pool = {k: rng.sample(range(0, 100), 20) for k in ("k0", "k1")}
    rrows = [(100 + i, f"k{i % 2}", pool[f"k{i % 2}"][i // 2]) for i in range(40)]
    left = _mk(spark, lrows, "lid bigint, k string, ts bigint")
    right = _mk(spark, rrows, "rid bigint, k string, ts bigint")
    spark_pdf = (
        asof_join_forward(left, right, on="ts", by="k")
        .select("lid", "rid_matched", "ts_matched")
        .toPandas()
    )
    lv = ", ".join(f"({i}, '{k}', {t})" for i, k, t in lrows)
    rv = ", ".join(f"({i}, '{k}', {t})" for i, k, t in rrows)
    # right (k, ts) unique by construction — tie law out of scope
    sql = f"""
WITH l AS (SELECT * FROM (VALUES {lv}) t(lid, k, ts)),
r AS (SELECT * FROM (VALUES {rv}) t(rid, k, ts))
SELECT l.lid, r.rid AS rid_matched, r.ts AS ts_matched
FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts <= r.ts
"""
    oracle_pdf = duckdb.connect().execute(sql).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert problems == [], problems
