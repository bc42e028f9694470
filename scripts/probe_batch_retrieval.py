"""10x scale probe for corpus.batch_retrieval (batch BM25 top-k).

Usage: PYTHONPATH=/root/repo python scripts/probe_batch_retrieval.py <n_docs>

Synthetic corpus with a GROWING vocabulary (vocab = n/2 — the sf0.1
documents table's ~30-term vocabulary makes every query match every
doc, which measures the dense-fanout worst case, not the pruned-index
path this operator is built for): n docs of 30 tokens, n/50 queries of
8 tokens drawn from the same law.  Measures the full plan wall (index
build + broadcast prune + fanout + top-10) and verifies the result is
non-degenerate (every query returns rows; rank 1 score >= rank 10).
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.corpus import batch_retrieval

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

vocab = max(n // 2, 100)


def text_expr(n_tok, base_col, stride):
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_tok - 1)),
            lambda i: F.concat(
                F.lit("w"), ((base_col * stride + i * 13) % vocab).cast("string")
            ),
        ),
        " ",
    )


docs = (
    spark.range(n)
    .select(F.col("id").alias("doc_id"), text_expr(30, F.col("id"), 7).alias("text"))
    .repartition(32)
    .localCheckpoint(eager=True)
)
queries = (
    spark.range(n // 50)
    .select(
        F.col("id").alias("query_id"),
        text_expr(8, F.col("id"), 7).alias("query_text"),
    )
    .localCheckpoint(eager=True)
)

t0 = time.time()
out = batch_retrieval(docs, queries, top_k=10)
agg = out.groupBy().agg(
    F.countDistinct("query_id").alias("nq"),
    F.count("*").alias("rows"),
    F.sum(F.when(F.col("rank") == 1, F.col("score"))).alias("s1"),
    F.sum(F.when(F.col("rank") == 10, F.col("score"))).alias("s10"),
).collect()[0]
wall = time.time() - t0
assert agg["nq"] == n // 50, f"queries lost: {agg['nq']} of {n // 50}"
# s10 is NULL when no query reaches rank 10 (sparse matches) — that is a
# probe-setup condition worth a clean message, not a TypeError
assert agg["s10"] is not None, "no query matched 10 docs: vocab too sparse"
assert agg["s1"] >= agg["s10"], "rank ordering broken"
print(
    f"n={n} queries={n // 50} wall={wall:.1f}s rows={agg['rows']} "
    f"nq={agg['nq']}"
)
spark.stop()
