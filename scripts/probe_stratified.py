"""10x scale probe for sampling.stratified_sample.

Usage: PYTHONPATH=/root/repo python scripts/probe_stratified.py <n_rows>

1000 strata with a Zipf-ish size skew (stratum = id mod 1000 weighted by
a squared hash so a few strata are hot), total budget n/100.  Verifies
the exact-budget law at both scales and prints wall.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.sampling import stratified_sample

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# skewed strata: square the hash so low strata ids soak up most rows
df = spark.range(n).select(
    F.col("id"),
    (((F.col("id") * 2654435761) % 1000) * ((F.col("id") * 2654435761) % 1000) / 1000)
    .cast("long")
    .alias("stratum"),
)
budget = n // 100

t0 = time.time()
out = stratified_sample(df, budget, "stratum", "id")
got = out.count()
wall = time.time() - t0
assert got == budget, (got, budget)
print(f"n={n} budget={budget} sampled={got} wall={wall:.1f}s (exact-budget law holds)")
