"""10x scale probe for reports.attribution.attribute_conversions and
windows.hopping_rollup over the same synthetic event stream.

Usage: PYTHONPATH=/root/repo python scripts/probe_attribution.py <n_events>

Events over a day: 80% touches / 20% conversions across n/50 users
(~10 touches per user-day — constant per-conversion window population,
so attribution rows scale linearly).  Hopping: 1h windows sliding 15min.
Run each scale in a FRESH process (SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.reports.attribution import attribute_conversions
from etl_scripts_spark.operators.windows import hopping_rollup

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

users = max(n // 50, 1)
ev = spark.range(n).select(
    F.col("id").alias("event_id"),
    F.timestamp_micros(
        F.lit(1_700_000_000_000_000) + (F.col("id") * 2654435761 % 86_400) * 1_000_000
    ).alias("ts"),
    (F.col("id") % users).alias("user_id"),
    # type keyed on id DIV users, NOT id: user = id % users, and users is
    # a multiple of 5 — an id%5 type law would give every user a constant
    # type (all-purchase users with zero touches → zero attribution rows,
    # the first probe run's symptom)
    F.when(F.expr(f"id DIV {users}") % 5 == 0, F.lit("purchase"))
    .when(F.expr(f"id DIV {users}") % 2 == 0, F.lit("click"))
    .otherwise(F.lit("view"))
    .alias("event_type"),
    ((F.col("id") % 1000).cast("double") / 10).alias("value"),
)
ev = ev.localCheckpoint(eager=True)

t0 = time.time()
att = attribute_conversions(ev, lookback_s=3600)
n_att = att.count()
wall_att = time.time() - t0

t1 = time.time()
hop = hopping_rollup(ev, 3600, 900, key_col="event_type", value_col="value")
n_hop = hop.count()
wall_hop = time.time() - t1
print(
    f"n={n} attribution: wall={wall_att:.1f}s rows={n_att}; "
    f"hopping: wall={wall_hop:.1f}s window_groups={n_hop}"
)
