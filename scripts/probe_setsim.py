"""10x scale probe for dedup.setsim_pairs (exact AllPairs join).

Usage: PYTHONPATH=/root/repo python scripts/probe_setsim.py <n_docs>

Synthetic corpus with VOCABULARY GROWING WITH THE CORPUS (the realistic
shape — fixed vocab at 10x would densify every posting and measure a
different problem): each doc draws 30 tokens from a doc-local window of
a size-n/2 vocab, so per-token document frequency stays ~constant
across scales and the planted-pair count scales linearly.  Every
10th doc gets a partner sharing 24/30 tokens (J = 24/36 = 2/3 ≥ 0.6).
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.dedup import setsim_pairs

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

vocab = max(n // 2, 100)
base = spark.range(n)
tok = F.transform(
    F.sequence(F.lit(0), F.lit(29)),
    lambda i: F.concat(F.lit("w"), ((F.col("id") * 7 + i * 13) % vocab).cast("string")),
)
docs = base.select(
    (F.col("id") * 2).alias("doc_id"), F.array_join(tok, " ").alias("text")
)
# partners: doc 2k+1 copies doc 2k's first 24 tokens + 6 fresh ones
ptok = F.transform(
    F.sequence(F.lit(0), F.lit(23)),
    lambda i: F.concat(F.lit("w"), ((F.col("id") * 7 + i * 13) % vocab).cast("string")),
)
fresh = F.transform(
    F.sequence(F.lit(0), F.lit(5)),
    lambda i: F.concat(F.lit("x"), (F.col("id") * 6 + i).cast("string")),
)
partners = base.where("id % 10 = 0").select(
    (F.col("id") * 2 + 1).alias("doc_id"),
    F.array_join(F.concat(ptok, fresh), " ").alias("text"),
)
corpus = docs.unionByName(partners).localCheckpoint(eager=True)

t0 = time.time()
pairs = setsim_pairs(corpus, "text", "doc_id", t_num=6, t_den=10)
n_pairs = pairs.count()
planted = pairs.filter(
    (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % 20 == 0)
).count()
wall = time.time() - t0
print(f"n={n} wall={wall:.1f}s pairs={n_pairs} planted_recovered={planted} expected_planted={n // 10}")
