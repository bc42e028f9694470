"""10x scale probe for er.link_records.

Usage: PYTHONPATH=/root/repo python scripts/probe_linkage.py <n_left>

n_left incoming records (40% typo'd copies of existing names, 60%
novel) against a fixed 50k-record right side.  The either-side
hot-block cap bounds candidate fan-out.  Fresh process per scale.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.er import link_records

n = int(sys.argv[1])
prefix_len = int(sys.argv[2]) if len(sys.argv) > 2 else 3
suffix_len = int(sys.argv[3]) if len(sys.argv) > 3 else None
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

R = 50_000
right = spark.range(R).select(
    (F.col("id") + 1_000_000).alias("rec_id"),
    F.concat(
        F.substring(F.md5(F.col("id").cast("string")), 1, 5),
        F.lit(" "),
        F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))), 1, 5),
    ).alias("name"),
)
base = F.pmod(F.xxhash64("id"), F.lit(R))
left = spark.range(n).select(
    F.col("id").alias("rec_id"),
    F.when(
        F.pmod(F.xxhash64("id", F.lit("t")), F.lit(10)) < 4,
        F.concat(  # typo'd copy of an existing name
            F.substring(F.md5(base.cast("string")), 1, 4),
            F.lit("z "),
            F.substring(F.md5(F.concat(base.cast("string"), F.lit("x"))), 1, 5),
        ),
    )
    .otherwise(
        F.concat(  # novel
            F.substring(F.md5(F.concat(F.lit("n"), F.col("id").cast("string"))), 1, 5),
            F.lit(" "),
            F.substring(F.md5(F.concat(F.lit("m"), F.col("id").cast("string"))), 1, 5),
        )
    )
    .alias("name"),
)

t0 = time.time()
out = link_records(left, right, "name", "name", threshold=0.8, prefix_len=prefix_len, suffix_len=suffix_len)
counts = {r["decision"]: r["n"] for r in out.groupBy("decision").agg(F.count("*").alias("n")).collect()}
wall = time.time() - t0
print(f"n_left={n} right={R} prefix_len={prefix_len} suffix_len={suffix_len} decisions={counts} wall={wall:.1f}s")
