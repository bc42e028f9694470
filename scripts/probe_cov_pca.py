"""10x scale probe for similarity.embedding_covariance + pca_project.

Usage: PYTHONPATH=/root/repo python scripts/probe_cov_pca.py <n_vectors>

d=16 synthetic embeddings with planted 2-factor structure (components
must stay stable across scales).  Measures the full fit+project chain:
covariance aggregate (the corpus-sized pass), single-row eigen stage,
Catalyst projection back over the corpus.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.similarity import (
    embedding_covariance,
    pca_components,
    pca_project,
)

n = int(sys.argv[1])
d = 16
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# two latent factors drive dims 0-7 and 8-15 resp., plus per-dim noise —
# all integer-derived so the data is identical across runs
f1 = (F.col("id") * 2654435761 % 1000).cast("double") / 100.0
f2 = (F.col("id") * 40503 % 1000).cast("double") / 100.0
vec = F.array(
    *[
        (f1 if k < 8 else f2) * (1.0 + k / 16.0)
        + ((F.col("id") * (k + 3) * 7919) % 97).cast("double") / 97.0
        for k in range(d)
    ]
).cast("array<float>")
emb = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
emb = emb.localCheckpoint(eager=True)

t0 = time.time()
cov = embedding_covariance(emb, "embedding")
comps = pca_components(cov, k=2)
out = pca_project(emb, "embedding", "vec_id", comps)
n_out = out.count()
wall = time.time() - t0
top = comps.select("component", "explained_variance_ratio").collect()
print(
    f"n={n} wall={wall:.1f}s projected={n_out} "
    f"evr={[(r.component, r.explained_variance_ratio) for r in top]}"
)
