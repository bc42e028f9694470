"""Batch-over-batch data observability: column profiles + drift report.

Why it belongs here: the reference validates every INCOMING file against
hand rules (barcode regexes, mandatory columns, checksum files — SURVEY
§2.2) but has nothing that watches the TABLES those files accumulate
into.  At 100 TB the failure mode that actually bites is silent drift —
an upstream schema change, a null-rate jump after a producer deploy, a
distinct-count collapse when an ID column starts truncating — detected
days later by a broken consumer.  Profiles turn each batch into a tiny
summary; the drift report diffs two summaries without ever re-reading
the older batch (same standing-index idea as the KMV/histogram sketch
merge laws in operators/sketch.py).

Scale shape: `profile_columns` melts the projected columns into
(column, value) pairs — a map-side fanout of ncols, no corpus-sized
state — then pays ONE distinct-style shuffle keyed by (column, value)
for the KMV distinct estimate and one 1-row aggregate for the exact
counts.  The profile output is ncols rows; `drift_report` joins two of
those — kilobytes regardless of table size.  Every number is either an
exact integer or the engine-portable KMV law, so a DuckDB oracle can
recompute the whole report bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import kmv_distinct


def profile_columns(df: DataFrame, columns: list[str] | None = None, k: int = 128) -> DataFrame:
    """(column, n_rows, n_null, distinct_est): one profile row per column.

    n_rows/n_null are exact; distinct_est is the KMV estimate (exact for
    columns with < k distinct values — the sketch is lossless there).
    Values are compared AS STRINGS (cast preserves null), which makes the
    law type-agnostic and engine-portable.
    """
    columns = columns or df.columns
    counts = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(F.col(c)).alias(f"_nn_{i}") for i, c in enumerate(columns)],
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_n").alias("n_rows"),
                        (F.col("_n") - F.col(f"_nn_{i}")).alias("n_null"),
                    )
                    for i, c in enumerate(columns)
                ]
            )
        ).alias("_s")
    ).select("_s.column", "_s.n_rows", "_s.n_null")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in columns
                ]
            )
        ).alias("_cv")
    ).select("_cv.column", "_cv.v").filter(F.col("v").isNotNull())
    distincts = kmv_distinct(melted, "column", "v", k=k).select(
        "column", F.col("est_distinct").alias("distinct_est")
    )
    # left join: an all-null column never reaches the KMV branch
    return counts.join(distincts, "column", "left").select(
        "column",
        "n_rows",
        "n_null",
        F.coalesce(F.col("distinct_est"), F.lit(0)).cast("bigint").alias("distinct_est"),
    )


def drift_report(
    base: DataFrame,
    new: DataFrame,
    null_rate_jump: float = 0.10,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
) -> DataFrame:
    """Diff two `profile_columns` outputs: one row per column with exact
    deltas and an ordered `status` — the worst applicable of

      added / removed            column set changed between batches
      null_rate_drift            null fraction moved more than `null_rate_jump`
      distinct_drift             distinct ratio outside `distinct_ratio_band`
      ok                         none of the above

    Pure arithmetic over 2×ncols rows: rates are rounded doubles (both
    engines divide IEEE-identically), everything else exact integers.
    """
    b = base.select(
        "column",
        F.col("n_rows").alias("base_rows"),
        F.col("n_null").alias("base_null"),
        F.col("distinct_est").alias("base_distinct"),
    )
    n = new.select(
        "column",
        F.col("n_rows").alias("new_rows"),
        F.col("n_null").alias("new_null"),
        F.col("distinct_est").alias("new_distinct"),
    )
    j = b.join(n, "column", "full")
    base_nr = F.col("base_null") / F.greatest(F.col("base_rows"), F.lit(1))
    new_nr = F.col("new_null") / F.greatest(F.col("new_rows"), F.lit(1))
    null_delta = F.round(new_nr - base_nr, 6)
    ratio = F.round(
        F.col("new_distinct") / F.greatest(F.col("base_distinct"), F.lit(1)), 6
    )
    status = (
        F.when(F.col("base_rows").isNull(), F.lit("added"))
        .when(F.col("new_rows").isNull(), F.lit("removed"))
        .when(F.abs(null_delta) > F.lit(null_rate_jump), F.lit("null_rate_drift"))
        .when(
            (F.col("base_distinct") > 0)
            & (
                (ratio < F.lit(distinct_ratio_band[0]))
                | (ratio > F.lit(distinct_ratio_band[1]))
            ),
            F.lit("distinct_drift"),
        )
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "column",
        status.alias("status"),
        "base_rows",
        "new_rows",
        "base_null",
        "new_null",
        "base_distinct",
        "new_distinct",
        F.when(
            F.col("base_rows").isNotNull() & F.col("new_rows").isNotNull(), null_delta
        ).alias("null_rate_delta"),
        F.when(
            F.col("base_rows").isNotNull() & F.col("new_rows").isNotNull(), ratio
        ).alias("distinct_ratio"),
    )


def schema_drift(base: DataFrame, new: DataFrame) -> list[tuple[str, str, str | None, str | None]]:
    """(column, status, base_type, new_type) for added / removed /
    retyped columns — empty list when the schemas agree.  Schema is
    driver-side METADATA (no data is collected); returned as plain
    tuples so callers can fail fast before launching a batch."""
    bt = dict(base.dtypes)
    nt = dict(new.dtypes)
    out = []
    for c in sorted(set(bt) | set(nt)):
        if c not in nt:
            out.append((c, "removed", bt[c], None))
        elif c not in bt:
            out.append((c, "added", None, nt[c]))
        elif bt[c] != nt[c]:
            out.append((c, "retyped", bt[c], nt[c]))
    return out


def psi_report(
    base_hist: DataFrame,
    new_hist: DataFrame,
    group_col: str = "column",
    smoothing: int = 1,
) -> DataFrame:
    """Population Stability Index per group from two histogram sketches
    (sketch.histogram_sketch outputs built with the SAME lo/hi/bins law):

        PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

    over the union of observed bins, with `smoothing` added to every
    count (the Laplace guard that keeps ln finite on empty bins).
    Conventional read: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    shifted — the standard distribution-drift metric alongside
    drift_report's null/distinct checks.

    O(groups × bins): the diff NEVER touches the original batches —
    yesterday's persisted sketch against today's, the same
    standing-index economics as the KMV/CMS merge laws.  Per-bin terms
    are rounded to 9 dp and summed as DECIMAL(20,9), so the PSI is
    independent of aggregation order and engine-portable.
    """
    if smoothing < 1:
        # with smoothing 0 a one-sided bin gives ln(0) → NULL, which
        # F.sum silently SKIPS — PSI would underestimate exactly when
        # drift is most extreme (mass arriving in brand-new bins)
        raise ValueError("smoothing must be >= 1 to keep every bin term finite")
    b = base_hist.select(group_col, "bin", F.col("cnt").alias("_bc"))
    n = new_hist.select(group_col, "bin", F.col("cnt").alias("_nc"))
    j = (
        b.join(n, [group_col, "bin"], "full")
        .fillna(0, ["_bc", "_nc"])
        .select(
            group_col,
            "bin",
            (F.col("_bc") + F.lit(smoothing)).alias("_bs"),
            (F.col("_nc") + F.lit(smoothing)).alias("_ns"),
        )
    )
    tot = j.groupBy(group_col).agg(
        F.sum("_bs").alias("_bt"), F.sum("_ns").alias("_nt")
    )
    p = F.col("_bs") / F.col("_bt")
    q = F.col("_ns") / F.col("_nt")
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
    psi = (
        j.join(F.broadcast(tot), group_col)
        .select(F.col(group_col), term.alias("_t"))
        .groupBy(group_col)
        .agg(F.sum("_t").alias("psi"))
    )
    status = (
        F.when(F.col("psi") < 0.1, F.lit("stable"))
        .when(F.col("psi") < 0.25, F.lit("moderate_shift"))
        .otherwise(F.lit("shifted"))
    )
    return psi.select(group_col, "psi", status.alias("status"))
