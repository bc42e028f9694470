"""Skew-aware aggregation: two-phase (salted) groupBy.

AQE's skew-join splitting handles joins, but a groupBy on a low-cardinality
or power-law key (event_type, language, file extension — all common in this
workload) still funnels each hot key through ONE reducer.  The classic fix:
salt the key, pre-aggregate per (key, salt), then combine per key.  Phase 1
spreads a hot key over `n_salts` reducers; phase 2 processes `n_salts` rows
per key — negligible.

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
