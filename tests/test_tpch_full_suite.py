"""The remaining TPC-H shapes (reports/tpch.py): every Spark-first
rewrite matches its TEXTBOOK correlated/nested SQL form in DuckDB on the
real testdata tables, and the load-bearing plan choices hold (pushdown,
equi-join under a disjunction, left-semi/left-outer, no nested loop).

Q2/Q9/Q11/Q20 ride the deterministic derived partsupp law
(`partsupp_df`/`PARTSUPP_SQL`) — both engines compute the identical
integer table, so the oracle stays independent of the Spark plan."""

from __future__ import annotations

from etl_scripts_spark.reports import tpch
from tests.conftest import SF_SMALL as SF
from tests.parity import compare, duckdb_con, plan_of as _plan


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def _duck(sql):
    return duckdb_con(SF).execute(sql).fetchdf()


# --- parity: every shape vs its textbook form ------------------------------

def test_q04_matches_textbook_exists(spark):
    got = tpch.q04_priority_exists(_t(spark, "orders"), _t(spark, "lineitem")).toPandas()
    want = _duck(tpch.q04_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q06_matches_textbook(spark):
    got = tpch.q06_forecast_revenue(_t(spark, "lineitem")).toPandas()
    want = _duck(tpch.q06_oracle_sql())
    assert got["revenue"][0] > 0
    assert compare(got, want) == []


def test_q08_matches_textbook(spark):
    got = tpch.q08_market_share(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "customer"),
        _t(spark, "supplier"), _t(spark, "nation"), _t(spark, "region"),
        _t(spark, "part"),
    ).toPandas()
    want = _duck(tpch.q08_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q10_matches_textbook(spark):
    got = tpch.q10_returned_items(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "customer"),
        _t(spark, "nation"),
    ).toPandas()
    want = _duck(tpch.q10_oracle_sql())
    assert len(got) == 20
    assert compare(got, want) == []


def test_q12_matches_textbook(spark):
    got = tpch.q12_shipmode_priority(_t(spark, "lineitem"), _t(spark, "orders")).toPandas()
    want = _duck(tpch.q12_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q13_matches_textbook(spark):
    got = tpch.q13_customer_distribution(_t(spark, "customer"), _t(spark, "orders")).toPandas()
    want = _duck(tpch.q13_oracle_sql())
    assert len(got) > 1
    assert compare(got, want) == []


def test_q14_matches_textbook(spark):
    got = tpch.q14_promo_effect(_t(spark, "lineitem"), _t(spark, "part")).toPandas()
    want = _duck(tpch.q14_oracle_sql())
    assert 0 < got["promo_revenue_pct"][0] < 100
    assert compare(got, want) == []


def test_q15_matches_textbook(spark):
    got = tpch.q15_top_supplier(_t(spark, "lineitem"), _t(spark, "supplier")).toPandas()
    want = _duck(tpch.q15_oracle_sql())
    assert len(got) >= 1
    assert compare(got, want) == []


def test_q19_matches_textbook(spark):
    got = tpch.q19_disjunctive_revenue(_t(spark, "lineitem"), _t(spark, "part")).toPandas()
    want = _duck(tpch.q19_oracle_sql())
    assert got["revenue"][0] > 0
    assert compare(got, want) == []


# --- derived partsupp: the law itself matches across engines ---------------

def test_partsupp_law_matches_duckdb(spark):
    got = tpch.partsupp_df(_t(spark, "part"), _t(spark, "supplier")).toPandas()
    want = _duck(f"SELECT * FROM ({tpch.PARTSUPP_SQL})")
    assert len(got) > 1000  # ~2/3 of 200×10 pairs
    assert compare(got, want) == []


def test_q02_matches_textbook_correlated_min(spark):
    got = tpch.q02_min_cost_supplier(
        _t(spark, "part"), _t(spark, "supplier"), _t(spark, "nation"),
        _t(spark, "region"),
    ).toPandas()
    want = _duck(tpch.q02_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q09_matches_textbook(spark):
    got = tpch.q09_product_profit(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "part"),
        _t(spark, "supplier"), _t(spark, "nation"),
    ).toPandas()
    want = _duck(tpch.q09_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q11_matches_textbook(spark):
    got = tpch.q11_important_stock(
        _t(spark, "part"), _t(spark, "supplier"), _t(spark, "nation"),
        _t(spark, "region"),
    ).toPandas()
    want = _duck(tpch.q11_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


def test_q20_matches_textbook(spark):
    got = tpch.q20_promotion_suppliers(
        _t(spark, "lineitem"), _t(spark, "part"), _t(spark, "supplier"),
        _t(spark, "nation"), _t(spark, "region"),
    ).toPandas()
    want = _duck(tpch.q20_oracle_sql())
    assert len(got) > 0
    assert compare(got, want) == []


# --- plan pins: the load-bearing physical choices ---------------------------

def test_q02_decorrelates_min_as_one_partial_aggregate(spark):
    """The textbook correlated MIN re-scans partsupp per outer row; the
    rewrite must compute the per-part minimum ONCE as a map-side-combined
    aggregate (partial_min before the exchange) joined back on
    (partkey, cost) equality."""
    plan = _plan(tpch.q02_min_cost_supplier(
        _t(spark, "part"), _t(spark, "supplier"), _t(spark, "nation"),
        _t(spark, "region"),
    ))
    assert "partial_min" in plan, "per-part MIN lost its map-side combine"


def test_q08_star_has_no_nested_loop(spark):
    """Q8's seven-table star must stay hash/broadcast joins end-to-end —
    the one completion query with no partsupp grid, so ZERO nested-loop
    joins are acceptable anywhere in its plan."""
    plan = _plan(tpch.q08_market_share(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "customer"),
        _t(spark, "supplier"), _t(spark, "nation"), _t(spark, "region"),
        _t(spark, "part"),
    ))
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan, marker


def test_q09_q11_outputs_stay_exact_integers(spark):
    """Profit (e4 units) and stock value (cents) are exact BIGINT
    end-to-end — a float anywhere would make the sums
    reduction-tree-dependent and break oracle parity at scale."""
    q09 = tpch.q09_product_profit(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "part"),
        _t(spark, "supplier"), _t(spark, "nation"),
    )
    assert dict(q09.dtypes)["sum_profit_e4"] == "bigint"
    q11 = tpch.q11_important_stock(
        _t(spark, "part"), _t(spark, "supplier"), _t(spark, "nation"),
        _t(spark, "region"),
    )
    assert dict(q11.dtypes)["value_cents"] == "bigint"


def test_q06_pushes_filters_to_scan(spark):
    plan = _plan(tpch.q06_forecast_revenue(_t(spark, "lineitem")))
    assert "PushedFilters: [" in plan
    # shipdate and quantity are plain scan-column predicates — they must
    # reach the parquet reader, not evaluate post-scan only
    import re
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed


def test_q19_stays_equi_join(spark):
    """The OR-of-conjuncts must ride an equi-join residual — a naive
    translation falls back to BroadcastNestedLoopJoin."""
    plan = _plan(tpch.q19_disjunctive_revenue(_t(spark, "lineitem"), _t(spark, "part")))
    assert "BroadcastHashJoin" in plan
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan, marker


def test_q04_plans_semi_join(spark):
    plan = _plan(tpch.q04_priority_exists(_t(spark, "orders"), _t(spark, "lineitem")))
    assert "LeftSemi" in plan


def test_q13_preserves_zero_customers(spark):
    """Customers with no qualifying orders land in the c_count=0 bucket —
    the textbook subtlety an inner join silently loses."""
    got = tpch.q13_customer_distribution(
        _t(spark, "customer"), _t(spark, "orders"),
        excl_priority="__nothing_excluded__",
    ).toPandas()
    # excluding nothing: every synthetic customer has orders, so force the
    # zero bucket by excluding everything instead
    all_excl = tpch.q13_customer_distribution(
        _t(spark, "customer"),
        _t(spark, "orders").limit(0),
    ).toPandas()
    assert int(all_excl.loc[all_excl["c_count"] == 0, "custdist"].iloc[0]) == 150
    assert int(got["custdist"].sum()) == 150


def test_q15_keeps_cost_ties(spark):
    """Two suppliers at the same max revenue must BOTH return (exact-cents
    equality): force a tie by restricting lineitem to one order where two
    suppliers ship identical (price, discount) lines."""
    import datetime
    rows = [
        (1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", datetime.datetime(1997, 2, 1)),
        (2, 10, 2, 1.0, 100.0, 0.0, 0.0, "N", "O", datetime.datetime(1997, 2, 1)),
    ]
    tie = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        "l_extendedprice double, l_discount double, l_tax double,"
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    got = tpch.q15_top_supplier(tie, _t(spark, "supplier")).toPandas()
    assert sorted(got["s_suppkey"].tolist()) == [1, 2]
