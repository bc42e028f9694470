"""10x scale probe for corpus.hashed_embedding (text -> vector on-ramp).

Usage: PYTHONPATH=/root/repo python scripts/probe_hashed_embedding.py <n_docs>

Synthetic 30-token docs (vocab grows with the corpus, like the setsim
probe), dim=64.  Verifies the emitted vector count and a global
component checksum at both scales.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.corpus import hashed_embedding

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

vocab = max(n // 2, 100)
tok = F.transform(
    F.sequence(F.lit(0), F.lit(29)),
    lambda i: F.concat(F.lit("w"), ((F.col("id") * 7 + i * 13) % vocab).cast("string")),
)
docs = spark.range(n).select(
    F.col("id").alias("doc_id"), F.array_join(tok, " ").alias("text")
)

t0 = time.time()
emb = hashed_embedding(docs, "text", "doc_id", dim=64)
agg = emb.select(
    F.aggregate("vec", F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)).alias("_l1")
).groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("_l1").alias("l1"))
r = agg.collect()[0]
wall = time.time() - t0
print(f"n={n} wall={wall:.1f}s vectors={r.n} total_l1={r.l1}")
