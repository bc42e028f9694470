"""10x scale probe for sinks/materialized.refresh_rollup.

Usage: PYTHONPATH=/root/repo python scripts/probe_refresh_rollup.py <n_changes>

Fixed 100k-group materialized rollup; a synthetic change feed of
n_changes rows (balanced insert/delete/update pairs) folds in.  The
claim under test: refresh work scales with |changes| (+ the fixed
|groups| join), never with the base table (which never appears).
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.sinks.materialized import refresh_rollup

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

GROUPS = 100_000
current = spark.range(GROUPS).select(
    F.concat(F.lit("g"), F.col("id").cast("string")).alias("grp"),
    F.lit(1000).alias("n"),  # headroom: random per-group sign swings never go negative
    (F.col("id") * 17).alias("sum_x"),
)

# feed: 1/4 inserts, 1/4 deletes, 1/2 update pre+post pairs — deletes and
# update preimages must subtract values consistent with `current`, so give
# every group enough count (n>=1) and make deltas small
ch = spark.range(n).select(
    F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(GROUPS)).cast("string")).alias("grp"),
    (F.col("id") % 7).alias("x"),
    F.element_at(
        F.array(
            F.lit("insert"), F.lit("delete"), F.lit("update_preimage"), F.lit("update_postimage")
        ),
        (F.col("id") % 4 + 1).cast("int"),
    ).alias("_change_type"),
)
t0 = time.time()
out = refresh_rollup(current, ch, ["grp"], ["x"])
rows = out.count()
wall = time.time() - t0
print(f"n_changes={n} groups_out={rows} wall={wall:.1f}s")
