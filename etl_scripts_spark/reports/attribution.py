"""Multi-touch conversion attribution — first/last/linear in one pass.

The marketing-analytics sibling of the funnel (q_funnel_conversion) and
retention (q_retention_cohorts) event queries: every conversion event is
attributed to the touch events that preceded it within a lookback
window, with exact integer weights.

Why the shapes are what they are:

  - candidate (conversion, touch) pairs come from
    intervals.point_in_interval_join — touches are points, each
    conversion is the interval [ts − lookback, ts] — so the pairing is
    ONE equi-join on (user, bin), never an inequality join (which
    Catalyst plans as a nested loop) and never a per-conversion window
    over all of history;
  - linear weights are exact integer parts-per-million with the
    largest-remainder completion (1_000_000 DIV n to everyone, the
    remainder's units to the EARLIEST touches) so every conversion's
    weights sum to exactly 1_000_000 — a float 1/n attribution neither
    sums to 1 nor reproduces across engines;
  - first/last flags ride the same per-conversion rank (ts, touch_id —
    a total order even under timestamp ties), so first-touch,
    last-touch and linear models are all read off ONE result.

Conversions with NO touch in the window are absent from the output (an
inner pairing); attribute them to a synthetic "direct" channel in the
caller if the model needs them — keeping the op inner avoids fabricating
a touch row shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.intervals import point_in_interval_join


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_s: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(conv_id, touch_id, touch_type, n_touches, touch_rank, is_first,
    is_last, weight_ppm) — one row per (conversion, touch-in-window)."""
    if lookback_s <= 0:
        raise ValueError("lookback_s must be positive")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    lb_us = lookback_s * 1_000_000
    base = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_ts"),
        F.col(id_col).alias("_eid"),
        F.col(type_col).alias("_et"),
    ).filter(F.col("_u").isNotNull() & F.col("_ts").isNotNull())
    touches = base.filter(F.col("_et").isin(*touch_types)).select(
        "_u",
        F.col("_ts").alias("pos"),
        F.col("_eid").alias("touch_id"),
        F.col("_et").alias("touch_type"),
    )
    convs = base.filter(F.col("_et") == conversion_type).select(
        "_u",
        (F.col("_ts") - F.lit(lb_us)).alias("start"),
        F.col("_ts").alias("end"),
        F.col("_eid").alias("conv_id"),
    )
    # the interval side's columns come back suffixed (_r) from the join
    pairs = point_in_interval_join(
        touches, convs, on="pos", by="_u", bin_width=lb_us
    ).withColumnRenamed("conv_id_r", "conv_id")
    # NULLS LAST explicitly on the tiebreak: a NULL touch_id would rank
    # first in Spark (asc default) but last in the DuckDB twin
    w = Window.partitionBy("conv_id").orderBy(
        F.asc("pos"), F.asc_nulls_last("touch_id")
    )
    ranked = pairs.select(
        "conv_id",
        "touch_id",
        "touch_type",
        F.row_number().over(w).alias("touch_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_touches"),
    )
    # weight = 1e6 DIV n, plus one extra ppm unit for the first
    # (1e6 mod n) touches in rank order — Σ per conversion == 1e6 exactly
    weight = F.expr("1000000 DIV n_touches") + F.when(
        F.col("touch_rank") <= F.expr("1000000 % n_touches"), F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.select(
        "conv_id",
        "touch_id",
        "touch_type",
        "n_touches",
        "touch_rank",
        (F.col("touch_rank") == 1).alias("is_first"),
        (F.col("touch_rank") == F.col("n_touches")).alias("is_last"),
        weight.cast("bigint").alias("weight_ppm"),
    )
