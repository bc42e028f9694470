"""10x scale probe for tpch.q02_min_cost_supplier (the decorrelated MIN).

Usage: PYTHONPATH=/root/repo python scripts/probe_tpch_q02.py <n_parts> [n_suppliers]

Synthetic star: n parts against a FIXED supplier dimension (default
1000) spread over the real sf0.001 nation/region dims (25 nations, 5
regions) — the bounded-dimension premise under which the grid is
map-only and the plan is linear in parts.  The costs being measured: the partsupp grid (part x
broadcast supplier dim, map-only, computed once per consumer subtree),
the per-part MIN as ONE map-side-combined aggregate (the textbook
correlated form re-scans partsupp per outer row — the shape this
rewrite exists to avoid), and the (partkey, cost) tie-keeping join
back.  The law to check: wall grows ~linearly in n (grid rows = n x
suppliers-in-region x 2/3; both the grid fan-out and the aggregate are
linear), never quadratically — a correlated evaluation would be
O(parts x partsupp).  Run each scale in a FRESH process (SCALE.md
probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.reports.tpch import q02_min_cost_supplier

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.001"
nation = spark.read.parquet(f"{SF}/nation.parquet")
region = spark.read.parquet(f"{SF}/region.parquet")

# size law keeps ~1/3 of parts in the probed band, like the real filter
part = spark.range(n).select(
    F.col("id").alias("p_partkey"),
    F.concat(F.lit("part#"), F.col("id").cast("string")).alias("p_name"),
    ((F.col("id") * 11) % 30 + 1).cast("int").alias("p_size"),
).repartition(32).localCheckpoint(eager=True)

# supplier stays FIXED as n grows (the plan argument is "supplier is a
# bounded DIMENSION"): pass it explicitly to probe other ratios.  NOTE
# the derived-partsupp law's fan-out is supplier-count-proportional --
# 2/3 of ALL in-region suppliers per part, NOT TPC-H's constant 4 -- so
# scaling BOTH axes 10x grows pair work 100x (measured: 36x wall, i.e.
# sub-linear in grid rows but quadratic in SF).  At a true 100 TB
# TPC-H the real partsupp table (linear in SF) would be ingested, not
# derived; the grid is this testdata's deterministic stand-in.
n_supp = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
supplier = spark.range(n_supp).select(
    F.col("id").alias("s_suppkey"),
    F.concat(F.lit("supp#"), F.col("id").cast("string")).alias("s_name"),
    ((F.col("id") * 7) % 25).cast("int").alias("s_nationkey"),
).localCheckpoint(eager=True)

t0 = time.time()
out = q02_min_cost_supplier(part, supplier, nation, region)
agg = out.groupBy().agg(
    F.count("*").alias("rows"),
    F.countDistinct("p_partkey").alias("nparts"),
    F.min("ps_supplycost_cents").alias("min_cost"),
).collect()[0]
wall = time.time() - t0
# every sized part with >=1 in-region supplier must appear, ties may
# add rows beyond nparts; the derived cost law floors at 1000 cents
assert agg["rows"] >= agg["nparts"] > 0, "result degenerate"
assert agg["min_cost"] >= 1000, "cost law violated"
print(
    f"n={n} suppliers={n_supp} wall={wall:.1f}s rows={agg['rows']} "
    f"nparts={agg['nparts']}"
)
spark.stop()
