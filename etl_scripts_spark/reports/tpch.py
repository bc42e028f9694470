"""TPC-H optimizer-shape queries the registry doesn't cover yet.

Q1/Q3/Q5/Q18/Q21 analogs are already registered (pricing summary,
shipping priority, revenue by nation, large orders, waiting orders);
this module adds the two remaining *rewrite-literacy* shapes over the
driver's schema:

- **Q17** (small-quantity-order revenue): a correlated scalar AVG
  subquery per part.  Naively that is one subquery execution per outer
  row; the Spark-first form aggregates per-part averages ONCE
  (agg-before-join, map-side combined, |parts|-sized) and joins them
  back — the same decorrelation a good optimizer performs, written
  explicitly so the plan is guaranteed, not hoped for.
- **Q22** (idle balances): a global scalar AVG threshold plus a
  NOT-EXISTS against orders.  Spark-first: the scalar attaches as a
  1-row broadcast (corpus.join_singleton shape) and NOT EXISTS becomes
  a left_anti join on the customer key.

Both oracles are the TEXTBOOK correlated forms (DuckDB decorrelates
them itself), so the rewrite is verified against an independent
formulation, not its own mirror.  Money sums ride DECIMAL(18,2) — a
double sum is reduction-tree-dependent (the q_pricing_summary recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """Average yearly revenue that would be lost if orders below 20% of a
    part's average quantity were no longer filled — one row (avg_yearly).

    Scale shape: the per-part quantity average is a |parts|-sized
    aggregate of the fact table (ONE map-side-combined shuffle), joined
    back broadcast; the brand filter prunes the part dimension before it
    touches anything.  The threshold compare happens in DOUBLE computed
    from exact DECIMAL sums (sum/count), so both engines divide the same
    exact integers — deterministic despite the float step."""
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.select("l_partkey", qty.alias("_qty"), price.alias("_price"))
    # prune to the brand's parts BEFORE aggregating: the per-part average
    # is over ALL lineitems of a part, and the brand filter is on the part
    # dimension, so cutting first changes nothing semantically while the
    # aggregate shrinks from |all parts| to |brand parts| (~96% of the
    # hash and the join-back shuffle would otherwise be thrown away)
    lib = li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
    avgs = (
        lib.groupBy("l_partkey")
        # count(*) (not count(qty)): the oracle's correlated subquery
        # divides by ALL of the part's rows — count(qty) would silently
        # diverge the threshold if a NULL quantity ever appears
        .agg(F.sum("_qty").alias("_sq"), F.count(F.lit(1)).alias("_nq"))
        .select(
            "l_partkey",
            (F.col("_sq").cast("double") / F.col("_nq")).alias("_avg_qty"),
        )
    )
    return (
        lib.join(avgs, "l_partkey")
        .filter(F.col("_qty").cast("double") < 0.2 * F.col("_avg_qty"))
        .agg(
            F.round(F.sum("_price").cast("double") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


def q17_oracle_sql(brand: str = "Brand#1") -> str:
    """Textbook correlated form (independent of the rewrite above)."""
    return f"""
SELECT round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = '{brand}'
  AND l_quantity::DOUBLE < (
    SELECT 0.2 * (sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


def q22_idle_balances(
    customer: DataFrame, orders: DataFrame, min_price: float = 450_000.0
) -> DataFrame:
    """Customers with above-average positive balance and NO high-value
    order (o_totalprice > min_price), grouped by country-code analog
    (c_nationkey % 7): (cntrycode, numcust, totacctbal_cents) — the
    TPC-H Q22 shape on the driver schema (every synthetic customer has
    SOME order, so the idle predicate keys on high-value orders to keep
    the anti join non-degenerate).

    Scale shape: the positive-balance average is ONE 1-row aggregate
    attached by broadcast (never a correlated re-scan); NOT EXISTS is a
    left_anti join on the customer key (orders project only o_custkey
    before the join).  Cents ride BIGINT so the grouped total is exact
    and order-independent."""
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    cust = customer.select(
        "c_custkey",
        (F.col("c_nationkey") % 7).cast("int").alias("cntrycode"),
        cents.alias("_cents"),
    )
    pos = cust.filter(F.col("_cents") > 0)
    thresh = pos.agg(
        (F.sum("_cents").cast("double") / F.count(F.lit(1))).alias("_avg_cents")
    )
    from ..operators.corpus import join_singleton

    rich = join_singleton(cust, thresh).filter(
        F.col("_cents").cast("double") > F.col("_avg_cents")
    )
    idle = rich.join(
        orders.filter(F.col("o_totalprice") > min_price).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
        "left_anti",
    )
    return idle.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("_cents").alias("totacctbal_cents"),
    )


def q22_oracle_sql(min_price: float = 450_000.0) -> str:
    """Textbook scalar-subquery + NOT EXISTS form."""
    return f"""
WITH c AS (
  SELECT c_custkey, (c_nationkey % 7)::INT AS cntrycode,
         floor(c_acctbal * 100 + 0.5)::BIGINT AS cents
  FROM customer
)
SELECT cntrycode, count(*)::BIGINT AS numcust,
       sum(cents)::BIGINT AS totacctbal_cents
FROM c
WHERE cents::DOUBLE > (
        SELECT sum(cents)::DOUBLE / count(*) FROM c WHERE cents > 0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_totalprice > {min_price})
GROUP BY cntrycode
"""
