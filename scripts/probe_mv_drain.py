"""10x scale probe for streaming/mv.rollup_maintenance_available_now.

Usage: PYTHONPATH=/root/repo python scripts/probe_mv_drain.py <n_feed_rows>

Three feed files (two insert shards, then a diff with updates %3,
deletes %11 and the pre/post image pairs), drained AvailableNow one file
per micro-batch through the CAS manifest chain.  The claim under test:
per-drain cost scales with the FEED (each micro-batch is
refresh_rollup's O(groups + batch)), never with the accumulated table —
the rollup stays groups-sized (64 groups here) at any n.  Verifies the
final committed rollup against the closed-form expectation exactly.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.streaming.mv import rollup_maintenance_available_now

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="mv-probe-")
base = spark.range(n).select(
    F.col("id").alias("k"),
    (F.col("id") % 64).cast("string").alias("grp"),
    (F.col("id") % 997).alias("x"),
)
ins = base.withColumn("_change_type", F.lit("insert"))
deleted = F.col("k") % 11 == 0
updated = (F.col("k") % 3 == 0) & ~deleted
diff = (
    base.filter(deleted)
    .withColumn("_change_type", F.lit("delete"))
    .unionByName(base.filter(updated).withColumn("_change_type", F.lit("update_preimage")))
    .unionByName(
        base.filter(updated)
        .withColumn("x", F.col("x") + 5)
        .withColumn("_change_type", F.lit("update_postimage"))
    )
)
feeds = [ins.filter(F.col("k") % 2 == 0), ins.filter(F.col("k") % 2 == 1), diff]
now = time.time()
for i, feed in enumerate(feeds):
    fdir = os.path.join(tmp, "feed", f"f{i}")
    feed.coalesce(4).write.parquet(fdir)
    # per-FILE offsets, not one per-feed stamp: the file source orders
    # micro-batches by mtime, and identical stamps would leave the order
    # of a feed's shards arbitrary — harmless for these commuting
    # insert deltas, but the probe should pin the causal order mv.py
    # documents rather than rely on commutativity (ADVICE r9).  Gap
    # derived from the file count so feed i's stamps never reach feed
    # i+1's window at any coalesce factor.
    names = sorted(os.listdir(fdir))
    gap = 20.0 / (len(names) + 1)
    for j, name in enumerate(names):
        stamp = now - 60 + i * 20 + (j + 1) * gap
        os.utime(os.path.join(fdir, name), (stamp, stamp))

t0 = time.time()
out = rollup_maintenance_available_now(
    spark,
    os.path.join(tmp, "feed", "f*"),
    "k bigint, grp string, x bigint, _change_type string",
    os.path.join(tmp, "root"),
    ["grp"],
    ["x"],
    checkpoint_dir=os.path.join(tmp, "ckpt"),
)
r = out.agg(
    F.count(F.lit(1)).alias("g"), F.sum("n").alias("tn"), F.sum("sum_x").alias("tx")
).collect()[0]
wall = time.time() - t0

exp = (
    base.filter(~deleted)
    .withColumn("x", F.when(updated, F.col("x") + 5).otherwise(F.col("x")))
    .agg(F.count(F.lit(1)).alias("tn"), F.sum("x").alias("tx"))
    .collect()[0]
)
ok = (r.tn, r.tx) == (exp.tn, exp.tx) and r.g == 64
print(
    f"n_feed={n} drain_wall={wall:.1f}s groups={r.g} "
    f"rows={r.tn}/{exp.tn} sum={r.tx}/{exp.tx} exact={'YES' if ok else 'NO'}"
)
shutil.rmtree(tmp, ignore_errors=True)
