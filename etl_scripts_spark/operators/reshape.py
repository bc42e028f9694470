"""Pivot / unpivot — the reshape pair an analytics engine owes its users.

The scale rule for pivot is the VALUE LIST: Spark's `pivot(col)` without
explicit values runs a hidden collect-distinct job over the fact table
just to learn the output columns; `pivot_table` therefore REQUIRES the
value list (pivoted columns are schema, and schema should not be
data-dependent — the same reasoning as drift.schema_drift).  Unpivot is
Spark's built-in melt (one map-side explode, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_table(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
    agg_col: str | None = None,
) -> DataFrame:
    """Wide per-group table: one row per group, one column per entry of
    `values` holding count(*) (agg_col=None) or the exact sum of
    `agg_col` over the matching slice.  Rows outside `values` are
    DROPPED (the explicit list is the contract); absent combinations
    emit 0, not NULL — a wide table full of NULL-vs-0 ambiguity poisons
    downstream arithmetic.

    Scale shape: ONE groupBy with map-side combine; the pivot compiles
    to CASE-inside-aggregate (pivot-with-values never scans twice).
    Sums require an exact type (int/long/decimal) — a double sum is
    reduction-tree-dependent, the module-wide rule."""
    if not values:
        raise ValueError("pivot values list must be non-empty")
    if len(set(values)) != len(values):
        raise ValueError("pivot values must be unique")
    if agg_col is not None:
        vtype = dict(df.dtypes).get(agg_col, "")
        if vtype in ("double", "float"):
            raise ValueError(
                f"pivot sum over {vtype} is reduction-tree-dependent; "
                "snap to cents/decimal first"
            )
    agg = (
        F.count(F.lit(1)) if agg_col is None else F.coalesce(F.sum(agg_col), F.lit(0))
    )
    out = (
        df.filter(F.col(pivot_col).isin(values))
        .groupBy(group_col)
        .pivot(pivot_col, values)
        .agg(agg)
    )
    # a group with NO rows for some pivot value gets a NULL cell from the
    # pivot itself (the in-aggregate coalesce only covers NULL measure
    # sums within a present cell) — normalize those to 0 too
    return out.na.fill(0, [str(v) for v in values])


def unpivot_table(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Melt `value_cols` into (id_cols..., variable, value) rows — the
    inverse reshape, e.g. feeding a wide metrics table into the drift /
    expectations engines.  Map-side only (Spark's built-in unpivot is an
    Expand node): ncols× row fanout, zero shuffles.  NULL cells are KEPT
    (a missing metric is information; callers filter if not)."""
    if not value_cols:
        raise ValueError("unpivot value_cols must be non-empty")
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
