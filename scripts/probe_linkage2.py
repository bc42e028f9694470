"""q_link_records stage decomposition (VERDICT r14 item 4): noop-sink
timings of each pipeline stage, hot-block cap occupancy, and candidate
counts at sf0.1 — is anything duplicated or cap-bound?"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from etl_scripts_spark.ckpt import free_session_litter
from etl_scripts_spark.operators.er import (
    _name_forms,
    _two_arm_sim,
    blocking_keys,
    link_candidates,
)
from etl_scripts_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def frames(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    k = F.col("c_custkey")
    t1 = F.substring(F.md5(k.cast("string")), 1, 5)
    t2 = F.substring(F.md5(F.concat(k.cast("string"), F.lit("x"))), 1, 5)
    right = cust.select(k.alias("rec_id"), F.concat_ws(" ", t1, t2).alias("name"))
    left = cust.select(
        (k + 1000000).alias("rec_id"),
        F.when(k % 3 == 0, F.concat_ws(" ", t1, F.concat(F.substring(t2, 1, 4), F.lit("z"))))
        .when(k % 3 == 1, F.concat_ws(" ", t2, t1))
        .otherwise(
            F.concat_ws(
                " ",
                F.substring(F.md5(F.concat(k.cast("string"), F.lit("n"))), 1, 5),
                F.substring(F.md5(F.concat(k.cast("string"), F.lit("m"))), 1, 5),
            )
        )
        .alias("name"),
    )
    return left, right


def main():
    from pyspark.sql import Window

    spark = get_spark("probe-linkage2")
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    for _ in range(2):
        free_session_litter(spark)
        left, right = frames(spark)
        t0 = time.time()
        lkeys = blocking_keys(left, "name", "rec_id")
        rkeys = blocking_keys(right, "name", "rec_id")
        print(f"lkeys noop {noop(lkeys):.3f}s rows={lkeys.count()}", flush=True)
        # hot-block occupancy: how close are blocks to the cap (50)?
        occ = (
            lkeys.unionByName(rkeys).groupBy("block_key").agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("max"), F.expr("percentile(n, 0.99)").alias("p99"),
                 F.count(F.lit(1)).alias("blocks"), F.sum(F.when(F.col("n") > 50, 1).otherwise(0)).alias("over_cap"))
        )
        print("block occupancy:", occ.collect()[0], flush=True)
        t_cand0 = time.time()
        cands = link_candidates(lkeys, rkeys, materialize=True)
        n_cands = cands.count()
        t_cand = time.time() - t_cand0
        print(f"candidates: {n_cands} rows in {t_cand:.3f}s", flush=True)
        ln = _name_forms(left, "name", "rec_id").select(
            F.col("rec_id").alias("id_l"), F.col("_nm").alias("_na"), F.col("_ts").alias("_ta")
        )
        rn = _name_forms(right, "name", "rec_id").select(
            F.col("rec_id").alias("id_r"), F.col("_nm").alias("_nb"), F.col("_ts").alias("_tb")
        )
        scored = (
            cands.join(ln, "id_l").join(rn, "id_r")
            .select("id_l", "id_r", _two_arm_sim("_na", "_ta", "_nb", "_tb").alias("sim"))
            .filter(F.col("sim") >= 0.85)
        )
        print(f"scored noop {noop(scored):.3f}s", flush=True)
        w = Window.partitionBy("id_l").orderBy(F.col("sim").desc(), F.col("id_r").asc())
        best = scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1).select("id_l", "id_r", "sim")
        out = left.select(F.col("rec_id").alias("id_l")).join(best, "id_l", "left")
        out = out.select("id_l", "id_r", "sim",
                         F.when(F.col("id_r").isNotNull(), F.lit("matched")).otherwise(F.lit("new")).alias("decision"))
        print(f"full noop {noop(out):.3f}s  total {time.time()-t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
