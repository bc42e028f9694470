"""10x scale probe for graph.bfs_distances.

Usage: PYTHONPATH=/root/repo python scripts/probe_bfs.py <n_nodes>

4n directed edges over n nodes (Knuth-hash endpoints — expander-like,
so the frontier saturates fast and every round does real work), 100
seed nodes, max_hops=4.  Prints wall + per-distance node counts.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.graph import bfs_distances

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# dst must NOT be an affine function of the edge id alone: for a fixed
# src residue the k-th replica sits at id ≡ const (mod n), and any
# (id·C + b) % n collapses to one value — all of a node's out-edges
# pointed at ONE dst and the frontier never grew (caught by the first
# probe run's flat dist_hist).  Mixing the replica index k = id DIV n
# into dst gives every node 4 DISTINCT spread-out destinations.
k = F.expr(f"id DIV {n}")
edges = spark.range(4 * n).select(
    (F.col("id") % n).alias("src"),
    ((F.col("id") * 2654435761 + 12345 + k * (1 + n // 3)) % n).alias("dst"),
)
seeds = spark.range(100).select((F.col("id") * 997 % n).alias("node"))

t0 = time.time()
out = bfs_distances(edges, seeds, max_hops=4)
hist = {r.dist: r.n for r in out.groupBy("dist").agg(F.count("*").alias("n")).collect()}
wall = time.time() - t0
print(f"n={n} edges={4*n} wall={wall:.1f}s dist_hist={dict(sorted(hist.items()))}")
