"""10x scale probe for sinks/cdc.snapshot_changes.

Usage: PYTHONPATH=/root/repo python scripts/probe_cdc.py <n_rows>

Two synthetic keyed snapshots of n rows: 1% of keys updated, 0.5%
deleted, 0.5% inserted (fresh key range).  Prints wall + feed rows.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.sinks.cdc import snapshot_changes

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def snap(ids, bump):
    return ids.select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), ((F.col("id") + bump) % 7).cast("string")).alias("color"),
        (F.col("id") * 3 + bump).alias("size"),
    )


old = snap(spark.range(n).where("id % 200 != 1"), 0)  # 0.5% absent from old → inserts
# updates: bump attrs on 1% of keys; deletes: drop 0.5% of keys from new
new_ids = spark.range(n).where("id % 200 != 3")
new = snap(new_ids, 0).withColumn(
    "size", F.when(F.col("k") % 100 == 7, F.col("size") + 1).otherwise(F.col("size"))
)

t0 = time.time()
feed = snapshot_changes(old, new, ["k"])
counts = {r["_change_type"]: r["n"] for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
wall = time.time() - t0
print(f"n={n} wall={wall:.1f}s counts={counts}")
