"""10x scale probe for corpus.pmi_collocations.

Usage: PYTHONPATH=/root/repo python scripts/probe_pmi.py <n_docs>

Synthetic docs of 20 words over a 10k-word Zipf-ish vocabulary (md5-
derived) so bigram types grow sub-linearly while tokens grow 10x.
Fresh process per scale.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.corpus import pmi_collocations

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# 20 words per doc; word w_k with k = h % (1 + h % 10000): the double-mod
# skews mass toward small k (cheap Zipf-ish head)
docs = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64("id", F.lit(j)),
                    F.pmod(F.xxhash64("id", F.lit(j * 31 + 7)), F.lit(9999)) + 2,
                ).cast("string"),
            )
            for j in range(20)
        ],
    ).alias("text"),
)

t0 = time.time()
out = pmi_collocations(docs, min_count=5)
rows = out.count()
wall = time.time() - t0
print(f"n_docs={n} scored_pairs={rows} wall={wall:.1f}s")
