"""Per-shard fixed-cost probe for the stateful streaming family (VERDICT
r13 item 2): time q_stream_sessionize (native session_window) and
q_stream_dedup (applyInPandasWithState) at forced shard counts on the
SAME 32-core session.  shards = clamp(approx_keys // 400, 4, configured),
so approx_keys picks the shard count exactly.

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_stream_shards.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_scripts_spark.session import get_spark
from etl_scripts_spark.streaming.stateful import stateful_first_seen_available_now
from etl_scripts_spark.streaming.windowed import session_windows_available_now

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
    spark = get_spark("probe-stream-shards")
    spark.sparkContext.setJobDescription("probe: stream shard economics")
    # warm the streaming machinery once so rep-1 JIT doesn't bias the sweep
    session_windows_available_now(spark, EVENTS, approx_keys=1600).count()
    stateful_first_seen_available_now(spark, EVENTS, approx_keys=1600).count()
    print("shards sweep (min of %d reps):" % REPS)
    for shards in (4, 8, 16, 32):
        keys = shards * 400  # shards_for_keys inverse
        t_sess, n1 = timeit(
            lambda: session_windows_available_now(spark, EVENTS, approx_keys=keys)
        )
        t_dedup, n2 = timeit(
            lambda: stateful_first_seen_available_now(spark, EVENTS, approx_keys=keys)
        )
        print(
            f"shards={shards:3d}  sessionize={t_sess:6.3f}s (rows {n1})  "
            f"first_seen={t_dedup:6.3f}s (rows {n2})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
