"""Second shard-economics sweep: user_totals (Python-stateful, 1500 keys)
and hourly rollup (native window agg, ~4k window keys) at forced shard
counts on local[32] — completes the probe matrix for tuning.py's law."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_scripts_spark.session import get_spark
from etl_scripts_spark.streaming.stateful import stateful_user_totals_available_now
from etl_scripts_spark.streaming.windowed import hourly_counts_available_now

SF_DIR = "/root/testdata/sf0.1"
EVENTS = f"{SF_DIR}/events.parquet"
REPS = 3


def timeit(fn):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        n = fn().count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main() -> None:
    spark = get_spark("probe-stream-shards2")
    stateful_user_totals_available_now(spark, EVENTS, approx_keys=1600).count()
    hourly_counts_available_now(spark, EVENTS, approx_keys=1600).count()
    print("shards sweep (min of %d reps):" % REPS)
    for shards in (4, 8, 16, 32):
        keys = shards * 400
        t_ut, n1 = timeit(
            lambda: stateful_user_totals_available_now(spark, EVENTS, approx_keys=keys)
        )
        t_h, n2 = timeit(
            lambda: hourly_counts_available_now(spark, EVENTS, approx_keys=keys)
        )
        print(
            f"shards={shards:3d}  user_totals={t_ut:6.3f}s (rows {n1})  "
            f"hourly={t_h:6.3f}s (rows {n2})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
