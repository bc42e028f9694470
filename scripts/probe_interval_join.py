"""10x scale probe for operators/intervals.interval_join.

Usage: PYTHONPATH=/root/repo python scripts/probe_interval_join.py <n_left>

Synthesizes n_left reads (span ~<=40) and n_left/20 annotation windows
(span ~<=2000) over 24 chrom keys with coordinate range growing with n
(constant density, so output scales ~linearly), joins at bin_width=512,
prints wall + output rows.  Run each scale in a FRESH process (SCALE.md
probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.intervals import interval_join

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

coord_max = n * 2  # constant interval density at any n

reads = spark.range(n).select(
    F.col("id").alias("lid"),
    F.concat(F.lit("chr"), (F.col("id") % 24).cast("string")).alias("chrom"),
    (F.xxhash64("id", F.lit("s")) % coord_max).alias("start"),
)
reads = reads.withColumn(
    "end", F.col("start") + F.pmod(F.xxhash64("lid", F.lit("w")), F.lit(41))
)

m = n // 20
wins = spark.range(m).select(
    F.col("id").alias("rid"),
    F.concat(F.lit("chr"), (F.col("id") % 24).cast("string")).alias("chrom"),
    (F.xxhash64("id", F.lit("t")) % coord_max).alias("start"),
)
wins = wins.withColumn(
    "end", F.col("start") + F.pmod(F.xxhash64("rid", F.lit("v")), F.lit(2001))
)

t0 = time.time()
out = interval_join(reads, wins, by="chrom", bin_width=512, max_bins=100_000)
rows = out.count()
wall = time.time() - t0
print(f"n_left={n} n_right={m} pairs={rows} wall={wall:.1f}s")
