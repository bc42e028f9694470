"""10x scale probe for reports/regression.grouped_ols.

Usage: PYTHONPATH=/root/repo python scripts/probe_grouped_ols.py <n_rows>

n rows over 1,000 groups, integer x/y.  One groupBy with map-side
combine — wall should track the scan.  Fresh process per scale.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.reports.regression import grouped_ols

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(n).select(
    F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(1000)).cast("string")).alias("g"),
    (F.pmod(F.xxhash64("id", F.lit("x")), F.lit(20001)) - 10000).alias("x"),
    (F.pmod(F.xxhash64("id", F.lit("y")), F.lit(20001)) - 10000).alias("y"),
)

t0 = time.time()
out = grouped_ols(df, "y", "x", ["g"])
rows = out.count()
wall = time.time() - t0
print(f"n={n} groups={rows} wall={wall:.1f}s")
