"""Star-CC round-shape probe (VERDICT r13 item 3): decompose
q_graph_components_chain's cost per round and A/B candidate round shapes
against the shipped one, value-checked against connected_components_star.

Variants:
  V1 current: union-symmetrize + groupBy/join per star
  V2 explode-symmetrize: large_star builds sym in ONE pass over the round
     checkpoint (posexplode of the two directed copies) instead of a
     2-scan union; everything else identical
  V3 init fusion: round 1 consumes the canonicalized edge set lazily
     (its distinct fuses into round 1's checkpoint job; fingerprint via a
     second observe) instead of a separate init checkpoint job

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_starcc.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from etl_scripts_spark.ckpt import free_local_checkpoint, free_session_litter
from etl_scripts_spark.operators.dedup import connected_components_star
from etl_scripts_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def chain_pairs(spark):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("k")
    )
    node = lambda col: F.concat(F.lit("C"), F.lpad(col.cast("string"), 6, "0"))  # noqa: E731
    return (
        c.alias("a")
        .filter(F.col("k") % 100 != 99)
        .join(c.alias("b"), F.col("b.k") == F.col("a.k") + 1)
        .select(node(F.col("a.k")).alias("id_a"), node(F.col("b.k")).alias("id_b"))
    )


def ckpt_fp(e: DataFrame):
    obs = Observation()
    observed = e.observe(
        obs, F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
    )
    cp = observed.localCheckpoint(eager=True)
    m = obs.get
    return cp, (m["n"], m["h"])


def small_star(e):
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    joined = e.join(mins, "u")
    rehung = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return rehung.union(self_edge).distinct()


def large_star_union(e):
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def large_star_explode(e):
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v")
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def small_star_window(e):
    from pyspark.sql import Window

    w = Window.partitionBy("u")
    em = e.withColumn("_m", F.min("v").over(w))
    rehung = em.filter(F.col("v") != F.col("_m")).select(
        F.col("v").alias("u"), F.col("_m").alias("v")
    )
    self_edge = em.filter(F.col("v") == F.col("_m")).select("u", "v")
    return rehung.union(self_edge).distinct()


def large_star_window(e):
    from pyspark.sql import Window

    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v")
    w = Window.partitionBy("u")
    em = sym.withColumn("_m", F.least(F.min("v").over(w), F.col("u")))
    return em.filter(F.col("v") > F.col("u")).select(
        F.col("v").alias("u"), F.col("_m").alias("v")
    )


def star_cc_w(pairs, small_star_fn, large_star_fn, per_star_ckpt: bool, max_iter: int = 30):
    canon = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    E, fp = ckpt_fp(canon)
    t_init_done = time.time()
    converged = False
    rounds = 0
    for _ in range(max_iter):
        t0 = time.time()
        ls = large_star_fn(E)
        mid = None
        if per_star_ckpt:
            mid = ls.localCheckpoint(eager=True)
            ls = mid
        new_e, new_fp = ckpt_fp(small_star_fn(ls))
        free_local_checkpoint(mid)
        rounds += 1
        free_local_checkpoint(E)
        E = new_e
        print(f"  round {rounds}: {time.time() - t0:.3f}s", flush=True)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    assert converged
    roots = E.select(F.col("v").alias("id")).distinct().withColumn("component", F.col("id"))
    members = E.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return members.unionByName(roots).distinct(), t_init_done


def run_w(spark, name, small_star_fn, large_star_fn, per_star_ckpt):
    free_session_litter(spark)
    t0 = time.time()
    pairs = chain_pairs(spark)
    out, t_init = star_cc_w(pairs, small_star_fn, large_star_fn, per_star_ckpt)
    rows = sorted((r.id, r.component) for r in out.collect())
    dt = time.time() - t0
    print(f"{name}: total {dt:.3f}s (init {t_init - t0:.3f}s), {len(rows)} rows", flush=True)
    return rows, dt


def star_cc(pairs, large_star, fuse_init: bool, max_iter: int = 30):
    canon = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    rounds = 0
    if fuse_init:
        obs0 = Observation()
        E = canon.observe(
            obs0, F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        )
        fp = None  # filled after round 1's job runs
    else:
        E, fp = ckpt_fp(canon)
        obs0 = None
    t_init_done = time.time()
    converged = False
    for _ in range(max_iter):
        t0 = time.time()
        new_e, new_fp = ckpt_fp(small_star(large_star(E)))
        rounds += 1
        if obs0 is not None:  # first fused round just ran: init fp now known
            fp = (obs0.get["n"], obs0.get["h"])
            obs0 = None
        else:
            free_local_checkpoint(E)
        E = new_e
        print(f"  round {rounds}: {time.time() - t0:.3f}s", flush=True)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    assert converged
    roots = E.select(F.col("v").alias("id")).distinct().withColumn("component", F.col("id"))
    members = E.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return members.unionByName(roots).distinct(), t_init_done


def run(spark, name, large_star, fuse_init):
    free_session_litter(spark)
    t0 = time.time()
    pairs = chain_pairs(spark)
    out, t_init = star_cc(pairs, large_star, fuse_init)
    rows = sorted((r.id, r.component) for r in out.collect())
    dt = time.time() - t0
    print(f"{name}: total {dt:.3f}s (init {t_init - t0:.3f}s), {len(rows)} rows", flush=True)
    return rows, dt


def main():
    spark = get_spark("probe-starcc")
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    # reference output once
    free_session_litter(spark)
    ref = sorted(
        (r.id, r.component)
        for r in connected_components_star(chain_pairs(spark)).collect()
    )
    for rep in range(2):
        print(f"--- pass {rep + 1}")
        for name, ls, fuse in (
            ("V1 union       ", large_star_union, False),
            ("V2 explode     ", large_star_explode, False),
        ):
            rows, _ = run(spark, name, ls, fuse)
            assert rows == ref, f"{name} output mismatch"
        for name, ss, ls, midck in (
            ("V4 window      ", small_star_window, large_star_window, False),
            ("V5 star-ckpt   ", small_star, large_star_union, True),
            ("V6 ckpt+explode", small_star, large_star_explode, True),
        ):
            rows, _ = run_w(spark, name, ss, ls, midck)
            assert rows == ref, f"{name} output mismatch"
    spark.stop()


if __name__ == "__main__":
    main()
