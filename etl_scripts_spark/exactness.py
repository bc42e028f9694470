"""The one definition of "exact-arithmetic input" for moment/measure ops.

Modules whose contract is bit-identical, partitioning-independent sums
(sinks/materialized.py rollups, reports/regression.py moments) share
this gate: integer types, or DECIMAL with scale 0.  Floats are rejected
because float addition is non-associative (the result would depend on
Spark's reduction tree); fractional-scale decimals are rejected because
the downstream decimal(38,0) casts would TRUNCATE them silently — snap
to a fixed-point integer grid first and the law stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def require_integral_columns(df: DataFrame, cols: list[str], who: str) -> None:
    """Raise unless every column is integer-typed or DECIMAL(p, 0)."""
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, _INTEGRAL):
            continue
        if isinstance(dt, T.DecimalType) and dt.scale == 0:
            continue
        raise ValueError(
            f"{who}: input `{c}` is {dt.simpleString()}: exact arithmetic "
            "needs integer (or scale-0 decimal) inputs — float sums are "
            "partitioning-dependent and fractional decimals would truncate; "
            "snap to a fixed-point integer grid first"
        )
