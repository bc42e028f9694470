"""As-of (nearest-preceding-event) join — an operator Spark lacks natively.

The naive formulation is an inequality join (`l.ts >= r.ts`) + greatest-per-
group, which Spark plans as a nested-loop or exploding range join — O(n·m)
per key.  The scale path used here is the tagged-union trick:

  1. tag right rows 0 and left rows 1, union them on (key, ts, tag);
  2. one window over (key) ordered by (ts, tag) carries the most recent
     right-side payload forward with `last(..., ignorenulls=True)`;
  3. keep left rows — each now holds its as-of match.

One shuffle on the key, one sort — identical cost to a sort-merge join of
the two inputs, linear in rows, independent of time-gap distribution.
Right-at-equal-ts sorts first, so the match is inclusive (l.ts >= r.ts),
matching DuckDB/pandas ASOF semantics.  The right payload travels as ONE
struct column: `last(ignorenulls)` then skips non-matching rows, never
individual null fields inside a matched row (a per-column carry would
resurrect older values for legitimately-null fields).

At 100 TB: the shuffle key is the `by` column — the same partitioning any
per-key sessionization uses; skewed keys split fine under AQE because the
window is per-key independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """True if a column of this type can appear in a window ORDER BY."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of-backward join: every left row + the latest right row with
    ``right[on] <= left[on]`` (per ``by`` key if given), or nulls if none.

    Right columns (except join keys) come back suffixed with ``suffix``.
    """
    payload_cols = [c for c in right.columns if c != by]
    tagged_left = left.withColumn("_side", F.lit(1))
    tagged_right = right.select(
        *( [F.col(by)] if by else [] ),
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rpay_s"),
    )
    # align schemas for the union: left keeps its full row, right carries
    # only (key, ts, payload struct)
    left_cols = [c for c in left.columns]
    unioned = tagged_left.select(
        *left_cols, "_side", F.lit(None).cast(tagged_right.schema["_rpay_s"].dataType).alias("_rpay_s")
    ).unionByName(
        tagged_right.select(
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols if c not in ((by,) if by else ()) and c != on],
            *( [F.col(by)] if by else [] ),
            F.col(on),
            "_side",
            "_rpay_s",
        ),
        allowMissingColumns=False,
    )
    # Deterministic tie handling: multiple right rows tied on (by, on) would
    # otherwise carry an arbitrary payload.  When the payload struct is
    # orderable (no map fields), it becomes the final tiebreak — the
    # greatest payload wins, reproducibly.  With unorderable payloads the
    # tie contract is unspecified (documented here, not silently random-ish:
    # within one execution the window sort is stable per partition, but
    # reruns may differ).
    order_cols = [F.col(on).asc(), F.col("_side").asc()]
    if _orderable(tagged_right.schema["_rpay_s"].dataType):
        order_cols.append(F.col("_rpay_s").asc())
    w = (
        Window.partitionBy(*( [by] if by else [] ))
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rpay_s", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
