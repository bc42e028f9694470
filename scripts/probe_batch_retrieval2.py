"""q_batch_retrieval variance root-cause probe (VERDICT r14 item 6):
phase-level timings repeated in one session, plus fresh-JVM repeats, to
separate cold-start (codegen/JIT) from steady-state variance.

Phases: (1) query-terms pin, (2) matched-postings repartition+agg pin,
(3) fanout join + (query,doc) agg + top-k window action.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from etl_scripts_spark.ckpt import free_session_litter
from etl_scripts_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main():
    import __spark_entry__ as entrymod

    spark = get_spark("probe-batch-retrieval2")
    queries = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for rep in range(5):
        free_session_litter(spark)
        spark.sparkContext.setJobDescription(f"batch_retrieval rep {rep}")
        t0 = time.time()
        df = queries["q_batch_retrieval"](spark, SF_DIR)
        t_construct = time.time() - t0  # includes the two eager pins
        t1 = time.time()
        n = df.count()
        t_action = time.time() - t1
        print(
            f"rep {rep}: construct+pins {t_construct:6.3f}s  action {t_action:6.3f}s"
            f"  total {t_construct + t_action:6.3f}s  rows {n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
