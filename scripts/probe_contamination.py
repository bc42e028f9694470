"""10x scale probe for dedup.benchmark_contamination_pairs.

Usage: PYTHONPATH=/root/repo python scripts/probe_contamination.py <n_train>

Synthetic corpus: n_train training docs of 60 words, 1% of which embed
an 8-gram lifted verbatim from one of 2,000 fixed benchmark docs (the
contamination to find); everything else is doc-unique text.  Prints wall
+ contaminated-pair count.  Run each scale in a FRESH process (SCALE.md
probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.dedup import benchmark_contamination_pairs

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_BENCH = 2000

# benchmark doc b: 12 words "bench-b-0 .. bench-b-11" (unique per doc)
bench = spark.range(N_BENCH).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        " ", *[F.concat(F.lit("bench"), F.col("id"), F.lit(f"w{j}")) for j in range(12)]
    ).alias("text"),
)

# train doc i: 60 unique filler words; every 100th doc splices in the
# first 8 words of benchmark doc (i % N_BENCH) at position 20
filler = [F.concat(F.lit("t"), F.col("id"), F.lit(f"f{j}")) for j in range(60)]
planted = [
    F.concat(F.lit("bench"), (F.col("id") % N_BENCH), F.lit(f"w{j}")) for j in range(8)
]
words = filler[:20] + [
    F.when(F.col("id") % 100 == 0, planted[j]).otherwise(filler[20 + j])
    for j in range(8)
] + filler[28:]
train = spark.range(n).select(
    F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
)

t0 = time.time()
pairs = benchmark_contamination_pairs(train, bench, n=8)
n_pairs = pairs.count()
wall = time.time() - t0
print(f"n={n} wall={wall:.1f}s pairs={n_pairs} expected={(n + 99) // 100}")
