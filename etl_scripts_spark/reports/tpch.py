"""TPC-H optimizer-shape queries: the full 22-query suite over the
driver's schema.

Q1/Q3/Q5/Q7/Q16/Q18/Q21 analogs are registered directly in
`__spark_entry__.py` (pricing summary, shipping priority, revenue by
nation, nation trade, parts-supplier count, large orders, waiting
orders); this module holds every remaining shape as a
(DataFrame-function, textbook-oracle-SQL) pair, so the whole decision
benchmark's rewrite literacy is covered:

- **Q17** correlated scalar AVG → agg-before-join decorrelation.
- **Q22** global scalar threshold (1-row broadcast) + NOT EXISTS
  (left_anti).
- **Q4** EXISTS → left_semi join before the aggregate.
- **Q6** pure scan filter-agg — the predicate-pushdown probe.
- **Q8** market share: CASE-inside-aggregate conditional ratio over a
  dimension star.
- **Q10** returned-item top-k: agg THEN deterministic rank cut.
- **Q12** conditional priority counts by line status.
- **Q13** left-outer zero-preserving two-level aggregate (distribution
  of counts).
- **Q14** promo revenue share (conditional ratio, single join).
- **Q15** top supplier: max-revenue scalar attached as a 1-row
  broadcast, DECIMAL-exact equality keeps ties.
- **Q19** disjunction-of-conjuncts: per-side envelope predicates pushed
  to both scans, the full OR evaluated as an equi-join residual —
  never a nested loop.
- **Q2/Q9/Q11/Q20** ride a deterministic derived `partsupp` (the
  testdata lacks that table): see `partsupp_df`/`PARTSUPP_SQL` — the
  integer law is computed identically in both engines.

Every oracle is the TEXTBOOK correlated/nested form (DuckDB
decorrelates it itself), so each rewrite is verified against an
independent formulation, not its own mirror.  Money sums ride
DECIMAL(18,2) — a double sum is reduction-tree-dependent (the
q_pricing_summary recipe); ratio/threshold compares either stay in
exact integers (Q11, Q20) or divide exact DECIMAL sums in one final
double step (Q8, Q14, Q17, Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _revenue():
    """The exact 4-dp revenue expression price*(1−disc) — defined ONCE:
    every query's parity story rests on this precision, so the module
    must not carry hand-copied variants that can drift apart."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )


def _revenue_cents():
    """Revenue in exact integer cents.  The floor is explicit: the 4-dp
    product has sub-cent residue, and a bare decimal→long cast truncates
    in Spark but rounds in DuckDB (SQL twin: floor(expr*100)::BIGINT)."""
    return F.floor(_revenue() * 100).cast("long")


def _qty_long():
    """l_quantity as BIGINT via explicit floor — same cross-engine cast
    hazard as cents (SQL twin: floor(l_quantity)::BIGINT)."""
    return F.floor(F.col("l_quantity")).cast("long")


def _region_suppliers(
    supplier: DataFrame, nation: DataFrame, region: DataFrame,
    r_name: str, cols: tuple[str, ...] = ("s_suppkey",),
) -> DataFrame:
    """Suppliers pruned to one region (broadcast dimension chain) —
    shared by Q2/Q11/Q20 so the region-pruning shape lives once."""
    rnations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == r_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return supplier.join(
        F.broadcast(rnations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(*cols)


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


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS → left_semi before the aggregate)
# ---------------------------------------------------------------------------

def q04_priority_exists(
    orders: DataFrame,
    lineitem: DataFrame,
    lo: str = "1997-01-01 00:00:00",
    hi: str = "1997-04-01 00:00:00",
) -> DataFrame:
    """Orders placed in a quarter that had at least one returned line
    ('late' is l_returnflag = 'R' in this schema, which lacks
    commit/receipt dates — the q_waiting_orders convention), counted by
    priority: (o_orderpriority, order_count).

    Scale shape: EXISTS compiles to a left_semi join — the probe side is
    the date-pruned orders slice, the build side projects ONLY
    l_orderkey before the exchange, and the semi join deduplicates
    per-order multiplicity inside the join (never a distinct shuffle +
    inner join, which would double-count and pay an extra exchange)."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    late = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(late, o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q04_oracle_sql(
    lo: str = "1997-01-01 00:00:00", hi: str = "1997-04-01 00:00:00"
) -> str:
    """Textbook EXISTS form."""
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{lo}' AND o_orderdate < TIMESTAMP '{hi}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (the predicate-pushdown probe)
# ---------------------------------------------------------------------------

def q06_forecast_revenue(lineitem: DataFrame, year: int = 1997) -> DataFrame:
    """One row: revenue = sum(extendedprice * discount) over a shipdate
    year, a discount band, and small quantities.

    Scale shape: this is THE pushdown query — every predicate references
    only scan columns, so shipdate/quantity bounds reach the parquet
    reader as PushedFilters (row-group stats prune before decode) and the
    only exchange is the final 1-row aggregate.  The discount band
    compares in DECIMAL(3,2): the raw doubles (0.05…) are not exact
    binary values, and a double BETWEEN would be engine-rounding
    dependent."""
    disc = F.col("l_discount").cast("decimal(3,2)")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") < 24)
            & (disc >= F.lit("0.05").cast("decimal(3,2)"))
            & (disc <= F.lit("0.07").cast("decimal(3,2)"))
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * disc)
            .cast("double")
            .alias("revenue")
        )
    )


def q06_oracle_sql(year: int = 1997) -> str:
    return f"""
SELECT sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(3,2))::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '{year + 1}-01-01 00:00:00'
  AND l_quantity < 24
  AND l_discount::DECIMAL(3,2) BETWEEN 0.05 AND 0.07
"""


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional ratio over a dimension star)
# ---------------------------------------------------------------------------

def q08_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    share_nation: str = "NATION_18",
    mkt_region: str = "ASIA",
    p_type: str = "PROMO",
) -> DataFrame:
    """Per order-year share of `share_nation`'s suppliers in the revenue
    of `p_type` parts sold into `mkt_region`: (o_year, mkt_share).

    Scale shape: the small dimensions broadcast (part pre-filtered by
    type, nation⋈region pre-filtered to the market region, supplier
    carrying its nation name); customer is the one LARGE dimension, so
    orders⋈customer shuffles on the customer key — broadcasting a
    customer-proportional side would be wrong at scale.  The fact
    shuffles once into the orderkey join and once into the per-year
    aggregate.  Numerator and
    denominator are CASE-inside-aggregate over the SAME pass (never two
    scans), summed in DECIMAL and divided in one final double step."""
    rev = _revenue()
    parts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    mkt_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == mkt_region)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("_mkt_nk"))
    mkt_cust = customer.join(
        F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("_mkt_nk")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("_s_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "_s_nation")
    li = (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "_s_nation", rev.alias("_rev"))
    )
    o = orders.join(
        mkt_cust, orders["o_custkey"] == mkt_cust["c_custkey"]
    ).select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    hit = F.when(F.col("_s_nation") == share_nation, F.col("_rev")).otherwise(
        F.lit("0").cast("decimal(18,2)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(hit).cast("double") / F.sum("_rev").cast("double"), 6
            ).alias("mkt_share")
        )
    )


def q08_oracle_sql(
    share_nation: str = "NATION_18", mkt_region: str = "ASIA", p_type: str = "PROMO"
) -> str:
    """Textbook nested-projection form."""
    return f"""
SELECT o_year,
       round(sum(CASE WHEN s_nation = '{share_nation}' THEN volume
                      ELSE 0 END)::DOUBLE
             / sum(volume)::DOUBLE, 6) AS mkt_share
FROM (
  SELECT extract(year FROM o_orderdate)::INT AS o_year,
         l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(3,2)) AS volume,
         sn.n_name AS s_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey AND p_type = '{p_type}'
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = '{mkt_region}'
) AS all_sales
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (aggregate THEN deterministic top-k)
# ---------------------------------------------------------------------------

def q10_returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    lo: str = "1997-01-01 00:00:00",
    hi: str = "1997-04-01 00:00:00",
    k: int = 20,
) -> DataFrame:
    """Top-k customers by revenue lost to returns in a quarter:
    (c_custkey, c_name, revenue_cents, c_acctbal, n_name).

    Scale shape: revenue aggregates to |customers| rows BEFORE any
    ordering (map-side combined), then the top-k cut runs on the
    aggregate — a TakeOrderedAndProject over |customers| rows, never a
    full sort of the fact table.  The cut key is (revenue DESC,
    c_custkey ASC): the textbook ORDER BY revenue LIMIT 20 is
    nondeterministic under revenue ties, so both engines break ties on
    the key.  Revenue rides exact cents (BIGINT) — a double revenue
    would make the ORDER-BY boundary engine-dependent.  Cents use an
    explicit floor: the 4-dp exact product has sub-cent residue, and a
    bare decimal→BIGINT cast truncates in Spark but rounds in DuckDB."""
    rev_cents = _revenue_cents()
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev_cents.alias("_cents")
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("_cents").alias("revenue_cents"))
    )
    enriched = per_cust.join(
        F.broadcast(
            customer.join(
                F.broadcast(nation.select("n_nationkey", "n_name")),
                F.col("c_nationkey") == F.col("n_nationkey"),
            ).select("c_custkey", "c_name", "c_acctbal", "n_name")
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        enriched.select("c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name")
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def q10_oracle_sql(
    lo: str = "1997-01-01 00:00:00", hi: str = "1997-04-01 00:00:00", k: int = 20
) -> str:
    return f"""
SELECT c_custkey, c_name,
       sum(floor(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount::DECIMAL(3,2)) * 100)::BIGINT)::BIGINT AS revenue_cents,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{lo}' AND o_orderdate < TIMESTAMP '{hi}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-priority line counts (conditional counts, one pass)
# ---------------------------------------------------------------------------

def q12_shipmode_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    year: int = 1997,
) -> DataFrame:
    """Per line status (the schema's stand-in for ship mode), how many
    returned lines shipped that year belonged to high- vs low-priority
    orders: (l_linestatus, high_line_count, low_line_count).

    Scale shape: the priority classification is CASE-inside-aggregate
    over ONE join pass (never two filtered scans); orders project
    (o_orderkey, priority→bit) before the exchange so the join carries
    two narrow columns.  The date+flag filters prune the fact at the
    scan."""
    o = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("_high"),
    )
    li = lineitem.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum("_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("_high")).alias("low_line_count"),
        )
    )


def q12_oracle_sql(year: int = 1997) -> str:
    return f"""
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '{year + 1}-01-01 00:00:00'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (zero-preserving two-level agg)
# ---------------------------------------------------------------------------

def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, excl_priority: str = "4-NOT SPECIFIED"
) -> DataFrame:
    """Distribution of per-customer order counts, excluding one priority
    class (the schema's stand-in for the textbook comment NOT LIKE):
    (c_count, custdist).

    Scale shape: the LEFT join is the load-bearing choice — customers
    with zero qualifying orders must survive into the c_count=0 bucket,
    which an inner join silently drops; count(o_orderkey) (not count(*))
    makes the unmatched row count 0, not 1.  Two aggregates: the first
    shuffles |orders| into |customers| groups (map-side combined), the
    second is |customers| → |distinct counts| (tiny)."""
    o = orders.filter(F.col("o_orderpriority") != excl_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q13_oracle_sql(excl_priority: str = "4-NOT SPECIFIED") -> str:
    return f"""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{excl_priority}'
  GROUP BY c_custkey
) AS c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share (conditional ratio, single join)
# ---------------------------------------------------------------------------

def q14_promo_effect(
    lineitem: DataFrame,
    part: DataFrame,
    lo: str = "1997-03-01 00:00:00",
    hi: str = "1997-04-01 00:00:00",
) -> DataFrame:
    """One row: percentage of one month's revenue from PROMO-type parts.

    Scale shape: part projects (p_partkey, is-promo bit) and broadcasts;
    numerator and denominator are CASE-inside-aggregate over the same
    pass.  Both sums stay DECIMAL-exact; the ratio is the single float
    step, rounded to 6 dp (the cross-engine division-parity recipe)."""
    rev = _revenue()
    p = part.select("p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("_promo"))
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    ).select("l_partkey", rev.alias("_rev"))
    return li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("_promo") == 1, F.col("_rev")).otherwise(F.lit("0").cast("decimal(18,2)"))).cast("double")
            / F.sum("_rev").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def q14_oracle_sql(lo: str = "1997-03-01 00:00:00", hi: str = "1997-04-01 00:00:00") -> str:
    return f"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(3,2))
                 ELSE 0 END)::DOUBLE
       / sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(3,2)))::DOUBLE, 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (max-revenue scalar as a 1-row broadcast; ties kept)
# ---------------------------------------------------------------------------

def q15_top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    lo: str = "1997-01-01 00:00:00",
    hi: str = "1997-04-01 00:00:00",
) -> DataFrame:
    """Supplier(s) with the maximum revenue in a quarter:
    (s_suppkey, s_name, total_revenue_cents).

    Scale shape: per-supplier revenue is ONE |suppliers|-sized aggregate;
    the max attaches back as a 1-row broadcast (join_singleton — never a
    rank window over the whole aggregate, and never a correlated
    re-scan).  Revenue compares in exact cents, so 'equals the max' is
    well-defined and ties survive — the textbook view formulation keeps
    ties too, a double-equality would keep them only by luck.  Cents
    floor explicitly (Spark truncates decimal→long, DuckDB rounds)."""
    from ..operators.corpus import join_singleton

    rev_cents = _revenue_cents()
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .select("l_suppkey", rev_cents.alias("_cents"))
        .groupBy("l_suppkey")
        .agg(F.sum("_cents").alias("total_revenue_cents"))
    )
    top = join_singleton(
        per_supp, per_supp.agg(F.max("total_revenue_cents").alias("_max_rev"))
    ).filter(F.col("total_revenue_cents") == F.col("_max_rev"))
    return top.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "total_revenue_cents")


def q15_oracle_sql(lo: str = "1997-01-01 00:00:00", hi: str = "1997-04-01 00:00:00") -> str:
    """Textbook revenue-view + scalar-max form."""
    return f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(floor(l_extendedprice::DECIMAL(18,2)
                   * (1 - l_discount::DECIMAL(3,2)) * 100)::BIGINT)::BIGINT AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q19 — disjunction of conjuncts (envelope pushdown + equi-join residual)
# ---------------------------------------------------------------------------

_Q19_ARMS = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 10, 30, 10, 20),
    ("Brand#3", 20, 50, 20, 30),
)


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """One row: revenue from lines matching ANY of three
    (brand, size-range, quantity-range) conjunct arms.

    Scale shape: the classic OR-of-conjuncts trap — a naive translation
    puts the whole disjunction in the join condition and Catalyst falls
    back to BroadcastNestedLoopJoin.  Spark-first: each side is
    pre-filtered by the UNION of its own arms' predicates (brand/size
    envelope on part, quantity envelope on lineitem — both reach the
    parquet scan as PushedFilters), the join stays a partkey EQUI-join,
    and the full disjunction evaluates as the join residual."""
    qty_lo = min(a[3] for a in _Q19_ARMS)
    qty_hi = max(a[4] for a in _Q19_ARMS)
    part_env = None
    residual = None
    for brand, slo, shi, qlo, qhi in _Q19_ARMS:
        p_arm = (F.col("p_brand") == brand) & F.col("p_size").between(slo, shi)
        arm = p_arm & F.col("l_quantity").between(qlo, qhi)
        part_env = p_arm if part_env is None else (part_env | p_arm)
        residual = arm if residual is None else (residual | arm)
    rev = _revenue()
    p = part.filter(part_env).select("p_partkey", "p_brand", "p_size")
    li = lineitem.filter(F.col("l_quantity").between(qty_lo, qty_hi)).select(
        "l_partkey", "l_quantity", rev.alias("_rev")
    )
    joined = li.join(
        F.broadcast(p), (F.col("l_partkey") == F.col("p_partkey")) & residual
    )
    return joined.agg(F.sum("_rev").cast("double").alias("revenue"))


def q19_oracle_sql() -> str:
    arms = []
    for brand, slo, shi, qlo, qhi in _Q19_ARMS:
        arms.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi} "
            f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        )
    disj = "\n   OR ".join(arms)
    return f"""
SELECT sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(3,2)))::DOUBLE AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {disj}
"""


# ---------------------------------------------------------------------------
# Derived partsupp — the testdata lacks the table, so both engines compute
# the SAME deterministic integer law over part × supplier
# ---------------------------------------------------------------------------

def partsupp_df(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Deterministic partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost_cents) — a supplier carries a part iff
    (p_partkey*7 + s_suppkey) % 3 != 0 (≈2/3 of pairs, matching TPC-H's
    several-suppliers-per-part fan-out), with integer qty/cost laws.

    Scale shape: supplier is a bounded DIMENSION, so the pair space is a
    part×broadcast-dim cross join — linear in |parts| with a constant
    fan-out, a map-only stage (declared in CROSS_JOINS_BY_DESIGN when a
    registered query consumes it).  Cost rides integer cents so every
    downstream sum/threshold stays exact.

    Caveat (measured, probe_tpch_q02): the fan-out is ~2/3 of ALL
    in-region suppliers per part — NOT TPC-H's constant 4 — so pair work
    is quadratic in SF if supplier is scaled alongside part (10×/10× =
    100× grid, measured 36× wall).  This is the testdata's deterministic
    stand-in for the missing partsupp table; at a real 100 TB TPC-H the
    actual partsupp (linear in SF) would be ingested and every consumer
    below is linear in it."""
    s = supplier.select("s_suppkey")
    pairs = part.select("p_partkey").crossJoin(F.broadcast(s))
    pk, sk = F.col("p_partkey"), F.col("s_suppkey")
    return pairs.filter((pk * 7 + sk) % 3 != 0).select(
        pk.alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((pk * 13 + sk * 5) % 1000 + 1).cast("int").alias("ps_availqty"),
        ((pk * 31 + sk * 17) % 9000 + 1000).cast("long").alias("ps_supplycost_cents"),
    )


PARTSUPP_SQL = """
  SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
         ((p_partkey * 13 + s_suppkey * 5) % 1000 + 1)::INT AS ps_availqty,
         ((p_partkey * 31 + s_suppkey * 17) % 9000 + 1000)::BIGINT AS ps_supplycost_cents
  FROM part, supplier
  WHERE (p_partkey * 7 + s_suppkey) % 3 <> 0
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN → decorrelated agg join-back)
# ---------------------------------------------------------------------------

def q02_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    size_lo: int = 10,
    size_hi: int = 20,
    r_name: str = "EUROPE",
) -> DataFrame:
    """For parts in a size band, the cheapest in-region supplier(s):
    (p_partkey, p_name, s_suppkey, s_name, n_name, ps_supplycost_cents).

    Scale shape: the textbook correlated MIN subquery re-scans partsupp
    per outer row; Spark-first computes the per-part minimum ONCE over
    the region-pruned partsupp (agg-before-join, map-side combined) and
    joins it back on (partkey, cost) — integer-cents equality keeps
    cost ties, exactly like the textbook form.  Region pruning happens
    on the supplier DIMENSION before partsupp is even materialized, so
    the pair fan-out only pays for in-region suppliers."""
    rsupp = _region_suppliers(
        supplier, nation, region, r_name, ("s_suppkey", "s_name", "n_name")
    )
    parts = part.filter(F.col("p_size").between(size_lo, size_hi)).select(
        "p_partkey", "p_name"
    )
    ps = partsupp_df(parts, rsupp)
    # rename the agg key: mins derives FROM ps, and joining the two on a
    # same-named column trips Spark's ambiguous-self-join analysis
    mins = (
        ps.groupBy(F.col("ps_partkey").alias("_mk"))
        .agg(F.min("ps_supplycost_cents").alias("_min_cost"))
    )
    best = ps.join(
        mins,
        (F.col("ps_partkey") == F.col("_mk"))
        & (F.col("ps_supplycost_cents") == F.col("_min_cost")),
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost_cents")
    return (
        best.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rsupp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            "ps_supplycost_cents",
        )
    )


def q02_oracle_sql(
    size_lo: int = 10, size_hi: int = 20, r_name: str = "EUROPE"
) -> str:
    """Textbook correlated-MIN form over the derived partsupp CTE."""
    return f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT p_partkey, p_name, s_suppkey, s_name, n_name, ps_supplycost_cents
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size BETWEEN {size_lo} AND {size_hi}
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{r_name}'
  AND ps_supplycost_cents = (
    SELECT min(ps_supplycost_cents)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = '{r_name}'
  )
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (exact integer profit, no float anywhere)
# ---------------------------------------------------------------------------

def q09_product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_word: str = "widget",
) -> DataFrame:
    """Profit on parts whose name contains `name_word`, by supplier
    nation and order year: (nation, o_year, sum_profit_e4).

    Profit per line = revenue − supply cost, in exact ten-thousandths
    (the 4-dp product price*(1−disc) scaled ×10000, minus
    cost_cents*100*qty) — BIGINT end to end, so the grouped sum is
    order-independent and needs no rounding recipe at all.

    Scale shape: part (name-filtered) and supplier broadcast; partsupp
    attaches by its (partkey, suppkey) law as a broadcast too (the
    name-pruned pair space is dimension-sized); orders project
    (orderkey, year) before the fact join.  One fact shuffle into the
    orderkey join, one into the (nation, year) aggregate."""
    parts = part.filter(F.col("p_name").contains(name_word)).select("p_partkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    ps = partsupp_df(parts, supp.select(F.col("s_suppkey")))
    li = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_revenue() * 10000).cast("long").alias("_rev_e4"),
        _qty_long().alias("_qty"),
    )
    o = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    joined = (
        li.join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    profit = F.col("_rev_e4") - F.col("ps_supplycost_cents") * 100 * F.col("_qty")
    return joined.groupBy("nation", "o_year").agg(
        F.sum(profit).alias("sum_profit_e4")
    )


def q09_oracle_sql(name_word: str = "widget") -> str:
    return f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT nation, o_year, sum(amount)::BIGINT AS sum_profit_e4
FROM (
  SELECT n_name AS nation,
         extract(year FROM o_orderdate)::INT AS o_year,
         (l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(3,2))
          * 10000)::BIGINT
         - ps_supplycost_cents * 100 * floor(l_quantity)::BIGINT AS amount
  FROM part, supplier, lineitem, partsupp, orders, nation
  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
    AND ps_partkey = l_partkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%{name_word}%'
) AS profit
GROUP BY nation, o_year
"""


# ---------------------------------------------------------------------------
# Q11 — important stock (global scalar threshold, exact-integer compare)
# ---------------------------------------------------------------------------

def q11_important_stock(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    r_name: str = "EUROPE",
    fraction_denom: int = 200,
) -> DataFrame:
    """Parts whose in-region stock value exceeds 1/fraction_denom of the
    region's total stock value: (ps_partkey, value_cents).

    Scale shape: the global total attaches as a 1-row broadcast
    (join_singleton) — never a correlated re-aggregate; the HAVING
    compare stays in exact integers (value*denom > total) so there is
    no float threshold to diverge between engines.  Region pruning hits
    the supplier dimension before the pair fan-out."""
    from ..operators.corpus import join_singleton

    rsupp = _region_suppliers(supplier, nation, region, r_name)
    ps = partsupp_df(part, rsupp)
    value = F.col("ps_supplycost_cents") * F.col("ps_availqty").cast("long")
    per_part = ps.groupBy("ps_partkey").agg(F.sum(value).alias("value_cents"))
    total = per_part.agg(F.sum("value_cents").alias("_total"))
    return (
        join_singleton(per_part, total)
        .filter(F.col("value_cents") * fraction_denom > F.col("_total"))
        .select("ps_partkey", "value_cents")
    )


def q11_oracle_sql(r_name: str = "EUROPE", fraction_denom: int = 200) -> str:
    """Textbook HAVING-scalar form (exact integer compare on both sides)."""
    return f"""
WITH partsupp AS ({PARTSUPP_SQL}),
rps AS (
  SELECT ps_partkey, ps_supplycost_cents * ps_availqty::BIGINT AS v
  FROM partsupp, supplier, nation, region
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = '{r_name}'
)
SELECT ps_partkey, sum(v)::BIGINT AS value_cents
FROM rps
GROUP BY ps_partkey
HAVING sum(v)::BIGINT * {fraction_denom} > (SELECT sum(v)::BIGINT FROM rps)
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (decorrelated half-sum + semi-join chain)
# ---------------------------------------------------------------------------

def q20_promotion_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    name_word: str = "bolt",
    year: int = 1997,
    r_name: str = "EUROPE",
) -> DataFrame:
    """In-region suppliers holding excess stock (availqty > half the year's
    shipped quantity) of any `name_word` part: (s_suppkey, s_name).

    Scale shape: the correlated per-(part,supplier) shipped-quantity
    subquery decorrelates into ONE (partkey, suppkey)-grouped aggregate
    of the date-pruned fact, joined to the name-pruned partsupp; the
    excess-stock compare stays in exact integers (availqty*2 >
    shipped); the supplier list is a semi-join (distinct suppkeys) so a
    supplier with many qualifying parts emits once.  An INNER join to
    the shipped aggregate reproduces the textbook NULL semantics: a
    (part,supplier) with no shipments that year has a NULL correlated
    sum and drops."""
    parts = part.filter(F.col("p_name").contains(name_word)).select("p_partkey")
    rsupp = _region_suppliers(supplier, nation, region, r_name, ("s_suppkey", "s_name"))
    ps = partsupp_df(parts, rsupp.select("s_suppkey"))
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_qty_long()).alias("_shipped"))
    )
    excess = ps.join(
        shipped,
        (F.col("ps_partkey") == F.col("l_partkey"))
        & (F.col("ps_suppkey") == F.col("l_suppkey")),
    ).filter(F.col("ps_availqty").cast("long") * 2 > F.col("_shipped"))
    return rsupp.join(
        excess.select(F.col("ps_suppkey")),
        rsupp["s_suppkey"] == F.col("ps_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


def q20_oracle_sql(
    name_word: str = "bolt", year: int = 1997, r_name: str = "EUROPE"
) -> str:
    """Textbook nested IN + correlated scalar form."""
    return f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT s_suppkey, s_name
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{r_name}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE '%{name_word}%')
      AND ps_availqty::BIGINT * 2 > (
        SELECT sum(floor(l_quantity)::BIGINT)
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '{year + 1}-01-01 00:00:00'
      )
  )
"""
