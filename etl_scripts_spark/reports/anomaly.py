"""Rolling-window anomaly detection over keyed time series.

The missing window-FRAME family: sessionize/funnel/retention cover
event-time grouping, drift/PSI cover distribution shift between batches —
this covers per-key, per-observation outliers against the key's own
trailing history (metric monitoring, sensor QC, the reference's
measurement-run sanity checks done statistically).

Law (engine-portable, deterministic): for each row, the trailing frame is
the previous `window` observations of the SAME key in `order_col` order
(ROWS BETWEEN window PRECEDING AND 1 PRECEDING — the current row is
excluded so a spike cannot mask itself).  Moments are EXACT integer sums
(DECIMAL(38,0)) over the frame; the only float steps are the final
mean/variance/z divisions, written as one canonical expression evaluated
identically by Spark and DuckDB (IEEE ops on identical inputs), rounded
to 9 dp — the same parity recipe as PSI/grouped-OLS.

Scale shape: ONE hash exchange on the key + one sort — linear in rows,
no self-join (the naive "join each row to its neighbors" formulation is
O(rows × window) shuffle).  Skewed keys: a single key's series sorts in
one task; series this op targets (per-metric, per-sensor) are bounded per
key — for a genuinely unbounded hot key, pre-slice by coarse time the way
operators/skew.py does for the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exactness import require_integral_columns


def rolling_zscore(
    df: DataFrame,
    by: str,
    order_col: str,
    value_col: str,
    window: int = 20,
    min_periods: int = 5,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Per-row z-score of `value_col` against the key's trailing window.

    Returns the input columns + (roll_n, z, is_anomaly): `roll_n` = how
    many prior observations the frame held; `z` = (x − mean)/std rounded
    to 9 dp, NULL while the frame is short (roll_n < min_periods), the
    frame is flat (zero variance), or x is NULL; `is_anomaly` =
    |z| > z_thresh, NULL exactly when z is NULL (three-valued, like the
    expectations engine — an undecidable row is surfaced, not dropped).

    Guards: duplicate (by, order_col) pairs raise loudly — with ties the
    frame CONTENTS depend on engine/partitioning sort stability, so the
    law would silently stop being deterministic (the guard is a peer
    count over the same sort, no extra exchange).  NULL order keys raise
    for the same reason (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    Integer values only (exactness gate) — float sums are reduction-tree
    dependent.
    """
    if window < 1:
        raise ValueError("rolling_zscore: window must be >= 1")
    if not 2 <= min_periods <= window:
        raise ValueError("rolling_zscore: need 2 <= min_periods <= window")
    require_integral_columns(df, [value_col], "rolling_zscore")
    clash = {"_rz_n", "_rz_s1", "_rz_s2"} & set(df.columns)
    if clash:
        raise ValueError(f"rolling_zscore: columns collide with internals: {sorted(clash)}")

    ob = Window.partitionBy(by).orderBy(order_col)
    frame = ob.rowsBetween(-window, -1)
    # peer group of the current order value: >1 ⇒ duplicate (by, order) key.
    # rangeBetween(0,0) = RANGE CURRENT ROW — rides the SAME sort/exchange.
    peers = F.count(F.lit(1)).over(ob.rangeBetween(0, 0))
    bad = F.col(order_col).isNull() | (peers > 1)
    v = F.col(value_col).cast("decimal(38,0)")
    n = F.count(v).over(frame)
    s1 = F.sum(v).over(frame)
    # value² ≤ (2^63)² < 10^38 — a single square always fits DECIMAL(38,0);
    # the SUM of squares can overflow (→ NULL non-ANSI / throw ANSI), which
    # the s2-null-with-rows guard below turns into a named raise either way
    s2 = F.sum(v * v).over(frame)
    overflow = (n > 0) & s2.isNull()
    nd = n.cast("double")
    mean = s1.cast("double") / nd
    # one canonical formula, mirrored verbatim in the oracle SQL: identical
    # IEEE ops on identical inputs → identical doubles in both engines
    var = (s2.cast("double") - s1.cast("double") * s1.cast("double") / nd) / (nd - 1)
    z = F.round((F.col(value_col).cast("double") - mean) / F.sqrt(var), 9)
    # the guard chain is embedded in EVERY output column (not just roll_n):
    # a caller selecting only z / is_anomaly would otherwise let Catalyst
    # prune the raising expression away with the column that carried it,
    # silently disabling the dup/NULL-order and overflow guards
    guard = F.when(
        bad,
        F.raise_error(
            F.lit("rolling_zscore: NULL or duplicate (key, order) — frame ill-defined")
        ),
    ).when(
        overflow, F.raise_error(F.lit("rolling_zscore: sum of squares overflowed"))
    )
    z_out = F.coalesce(
        guard.cast("double"), F.when((n >= min_periods) & (var > 0), z)
    )
    return df.select(
        *df.columns,
        F.coalesce(guard.cast("bigint"), n).alias("roll_n"),
        z_out.alias("z"),
        F.when(z_out.isNotNull(), F.abs(z_out) > F.lit(z_thresh)).alias("is_anomaly"),
    )
