"""10x scale probes for graph.k_core and reports.anomaly.mad_outliers.

Usage: PYTHONPATH=/root/repo python scripts/probe_kcore_mad.py <n>

k-core: 4n edges over n nodes with a planted dense core (500 clique
nodes wired all-to-all in a ring of width 20) inside a sparse random
sea that peels away — the core must survive exactly at both scales.
MAD: n integer values over 64 groups with 1% planted 100x outliers.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.graph import k_core
from etl_scripts_spark.reports.anomaly import mad_outliers

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# sparse sea: expander-ish edges among nodes [1000, n)
k_rep = F.expr(f"id DIV {n}")
sea = spark.range(4 * n).select(
    (F.col("id") % (n - 1000) + 1000).alias("src"),
    ((F.col("id") * 2654435761 + 12345 + k_rep * (1 + n // 3)) % (n - 1000) + 1000).alias("dst"),
)
# planted core: nodes 0..499, each wired to the next 20 ring neighbors
# (degree ~40 ≫ k) — survives any k ≤ 40 peel
core = spark.range(500 * 20).select(
    (F.col("id") % 500).alias("src"),
    ((F.col("id") % 500 + F.expr("id DIV 500") + 1) % 500).alias("dst"),
)
edges = sea.unionByName(core).localCheckpoint(eager=True)

t0 = time.time()
kc = k_core(edges, k=12)
n_core = kc.count()
wall_k = time.time() - t0

vals = spark.range(n).select(
    F.col("id"),
    (F.col("id") % 64).alias("grp"),
    F.when(F.col("id") % 100 == 7, (F.col("id") % 1000 + 100_000))
    .otherwise(F.col("id") % 1000)
    .cast("long")
    .alias("v"),
)
t1 = time.time()
mo = mad_outliers(vals, "v", by="grp", k_num=5, k_den=1)
n_out = mo.filter("is_outlier").count()
wall_m = time.time() - t1
print(
    f"n={n} kcore: wall={wall_k:.1f}s core_nodes={n_core} (planted 500); "
    f"mad: wall={wall_m:.1f}s outliers={n_out} (~{n // 100} planted)"
)
