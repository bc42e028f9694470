"""Skew-aware aggregation: two-phase (salted) groupBy.

AQE's skew-join splitting handles joins, but a groupBy on a low-cardinality
or power-law key (event_type, language, file extension — all common in this
workload) still funnels each hot key through ONE reducer.  The classic fix:
salt the key, pre-aggregate per (key, salt), then combine per key.  Phase 1
spreads a hot key over `n_salts` reducers; phase 2 processes `n_salts` rows
per key — negligible.  Caveat: the deterministic salt is
spark_partition_id() % n_salts, so a hot key confined to a SINGLE input
partition gets one salt — but that case is exactly where map-side partial
aggregation already collapses the key to one partial row per partition, so
the reducer still receives O(partitions-holding-the-key) rows, not the raw
row count; the shuffle stays bounded either way.

Spark's map-side partial aggregation already does this implicitly for
algebraic aggregates when upstream partitions are well-mixed; explicit
salting matters when the input arrives clustered by the hot key (e.g. a
scan of files partitioned by event_type), where partial aggregation buys
nothing and one reducer still receives the whole hot key's partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed `keys`.

    `aggs` maps output column name → (phase1_agg_expr, phase2_combine_expr),
    where phase 2 operates on the phase-1 column of the same name, e.g.::

        salted_agg(df, ["event_type"], {
            "n":   (F.count("*"),        F.sum("n")),
            "tot": (F.sum("value"),      F.sum("tot")),
            "mx":  (F.max("value"),      F.max("mx")),
        })

    Only algebraic aggregates decompose this way (count→sum, sum→sum,
    min/max→min/max); averages must be composed from sum+count by the
    caller.  The salt is deterministic (hash of a random-free row spread via
    spark_partition_id) so results are reproducible.
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """(rank, key, n, share_ppm) for the `top_k` heaviest values of a
    prospective join/groupBy key — the diagnosis step BEFORE salting:
    salted_agg and AQE skew-split are mitigations you apply once you
    know a key is hot, and this report is how you find out (and how you
    verify the mitigation's assumption still holds after a data shift).

    share_ppm is EXACT integer parts-per-million ((n·1e6) DIV total —
    a float share would differ across engines at the 17th digit and
    break the oracle hash).  NULL keys are counted like any other value
    (a NULL-heavy join key is the most common real-world skew).

    Scale shape: ONE map-side-combined groupBy on the key, a 1-row
    total attach (join_singleton — the CROSS_JOINS_BY_DESIGN shape),
    and a global (n DESC, key ASC) top-k that plans as TakeOrdered —
    the rank cut never shuffles the full key table.  Deterministic
    under ties via the key tiebreak.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from .corpus import join_singleton
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.groupBy().agg(F.sum("n").alias("_total"))
    top = (
        join_singleton(counts, total)
        .orderBy(F.desc("n"), F.asc_nulls_last("key"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("n"), F.asc_nulls_last("key"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "n",
        F.expr("n * 1000000 DIV _total").cast("bigint").alias("share_ppm"),
    )
