"""Interval-overlap join — bin-bucketed, so Spark never nested-loops it.

The naive formulation (`l.start <= r.end AND r.start <= l.end`, optionally
plus an equi-key) is what a genomics overlap (variant positions × gene /
panel windows — the batch face of the reference's VCF position handling,
`register-iontorrent-data.py`'s variant-vs-panel matching) or a time-range
reconciliation needs.  Spark plans the pure-inequality form as
BroadcastNestedLoopJoin — O(n·m) work and a forced broadcast of one whole
table; with an equi-key it still re-scans every key group pairwise.

The scale path here is fixed-width binning with an EMIT-ONCE law:

  1. each interval explodes to the bins it covers
     (`floor(start/W) .. floor(end/W)` — floor, not truncate, so negative
     coordinates bin consistently);
  2. the join is an EQUI-join on (key?, bin) with the overlap predicate
     AND the emit-once predicate fused into the join condition: a pair is
     emitted only in the FIRST bin of its overlap region,
     `bin == floor(greatest(l.start, r.start) / W)`.  Every overlapping
     pair shares that bin by construction (it is inside both intervals),
     so each pair appears exactly once and no `distinct` shuffle is ever
     needed;
  3. Catalyst plans the result as an ordinary shuffled/broadcast hash
     join — predicate pushdown, AQE skew-split (dense genomic hotspots
     split at runtime, which a window-based formulation cannot get), and
     whole-stage codegen all apply.

Cost: |rows| × (span/W + 1) exploded rows feeding one equi-join.
`bin_width` should be ~the typical interval span: too small explodes long
intervals, too large piles unrelated intervals into shared bins (the join
re-verifies overlap, so correctness never depends on W — only cost does).
A loud `raise_error` fires when a single interval would explode past
`max_bins` (a 3-gigabase interval at W=1 is a data bug, not a join input),
and when `start > end` (an inverted interval means corrupt bounds — the
raw SQL predicate would silently half-match it).

Closed-interval semantics: touching endpoints (`l.end == r.start`) DO
overlap — the same predicate the DuckDB native-IEJoin oracle runs
(`oracle.interval_join_sql`).  Coordinates are integers (snap floats to a
fixed grid first — the emit-once law needs exact arithmetic).  NULL
bounds match nothing, exactly as the SQL predicate decides (the NULL bin
sequence explodes to no rows, the same verdict with the same mechanism
cost-wise: such rows never reach the join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(col: str, w: int) -> Column:
    """floor(col / w) on BIGINT, exact for any int64 coordinate.

    Spark's `div` truncates toward zero; floor and truncate disagree on
    negatives with a remainder, and a pair straddling zero would then bin
    inconsistently and miss its own overlap bin.  Subtracting the
    non-negative remainder first makes the operand an exact multiple of
    `w`, where truncation == floor (never float division: exactness past
    2^53 is part of the contract).
    """
    c = f"cast(`{col}` as bigint)"
    return F.expr(f"({c} - ((({c} % {w}) + {w}) % {w})) div {w}")


def _explode_bins(
    df: DataFrame, start: str, end: str, w: int, max_bins: int
) -> DataFrame:
    """One row per bin the interval [start, end] covers, `_bin` column.

    Inverted intervals and bin blowups raise loudly (see module doc);
    NULL bounds yield a NULL sequence, which explode drops.
    """
    b0, b1 = _bin_of(start, w), _bin_of(end, w)
    guarded = F.when(
        F.col(start) > F.col(end),
        F.raise_error(
            F.format_string(
                f"interval_join: inverted interval ({start} > {end}): %s > %s",
                F.col(start).cast("string"),
                F.col(end).cast("string"),
            )
        ),
    ).when(
        b1 - b0 + 1 > max_bins,
        F.raise_error(
            F.format_string(
                f"interval_join: interval spans more than max_bins={max_bins} "
                f"bins at bin_width={w}: [%s, %s]",
                F.col(start).cast("string"),
                F.col(end).cast("string"),
            )
        ),
    ).otherwise(F.sequence(b0, b1))
    return df.withColumn("_bin", F.explode(guarded))


def _suffix_map(
    left_cols: list[str], right_cols: list[str], by: str | None, suffix: str
) -> dict[str, str]:
    """Right-side output names (`by` passes through, the rest suffixed);
    raises on a collision with a left column — a silent ambiguous
    reference would otherwise surface as a confusing analysis error
    (or worse, bind to the wrong side) deep inside the join condition."""
    renamed = {c: (c if c == by else c + suffix) for c in right_cols}
    clash = [v for c, v in renamed.items() if c != by and v in left_cols]
    if clash:
        raise ValueError(
            f"interval_join: suffixed right columns collide with left: {clash}"
        )
    reserved = {"_bin"} & (set(left_cols) | set(right_cols) | set(renamed.values()))
    if reserved:
        raise ValueError(
            "interval_join: '_bin' is a reserved working column name"
        )
    return renamed


def _check_widths(bin_width: int, max_bins: int) -> None:
    """Loud up-front validation: a negative width makes bins DECREASE with
    coordinates (sequence() counts down, the emit-once bin falls outside
    the other side's bin set — overlapping pairs silently vanish), and
    zero dies as a raw divide-by-zero deep in codegen."""
    if bin_width <= 0:
        raise ValueError(f"interval_join: bin_width must be positive, got {bin_width}")
    if max_bins <= 0:
        raise ValueError(f"interval_join: max_bins must be positive, got {max_bins}")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str | None = None,
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("start", "end"),
    bin_width: int = 1_000,
    suffix: str = "_r",
    max_bins: int = 10_000,
) -> DataFrame:
    """Inner join of overlapping closed intervals, one row per pair.

    Output: every left column, plus every right column except ``by``
    suffixed with ``suffix``.  Overlap is inclusive on both ends.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    _check_widths(bin_width, max_bins)
    renamed = _suffix_map(left.columns, right.columns, by, suffix)
    rdf = right.select([F.col(c).alias(renamed[c]) for c in right.columns])

    lb = _explode_bins(left, ls, le, bin_width, max_bins)
    rb = _explode_bins(rdf, renamed[rs], renamed[re_], bin_width, max_bins)

    cond = (
        (lb["_bin"] == rb["_bin"])
        & (F.col(ls) <= F.col(renamed[re_]))
        & (F.col(renamed[rs]) <= F.col(le))
        # emit-once: only in the first bin of the overlap region
        & (
            lb["_bin"]
            == F.greatest(_bin_of(ls, bin_width), _bin_of(renamed[rs], bin_width))
        )
    )
    if by is not None:
        cond = (lb[by] == rb[by]) & cond
    out_cols = [lb[c] for c in left.columns] + [
        rb[renamed[c]] for c in right.columns if c != by
    ]
    return lb.join(rb, cond, "inner").select(*out_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "pos",
    by: str | None = None,
    bounds: tuple[str, str] = ("start", "end"),
    bin_width: int = 1_000,
    suffix: str = "_r",
    max_bins: int = 10_000,
) -> DataFrame:
    """Inner join of points to the closed intervals containing them.

    A point occupies exactly one bin, so no emit-once predicate is needed:
    the containing interval covers that bin and the pair joins there once.
    Only the interval side pays the bin fan-out.
    """
    s, e = bounds
    _check_widths(bin_width, max_bins)
    renamed = _suffix_map(points.columns, intervals.columns, by, suffix)
    idf = intervals.select([F.col(c).alias(renamed[c]) for c in intervals.columns])

    pb = points.withColumn("_bin", _bin_of(on, bin_width))
    ib = _explode_bins(idf, renamed[s], renamed[e], bin_width, max_bins)

    cond = (
        (pb["_bin"] == ib["_bin"])
        & (F.col(renamed[s]) <= F.col(on))
        & (F.col(on) <= F.col(renamed[e]))
    )
    if by is not None:
        cond = (pb[by] == ib[by]) & cond
    out_cols = [pb[c] for c in points.columns] + [
        ib[renamed[c]] for c in intervals.columns if c != by
    ]
    return pb.join(ib, cond, "inner").select(*out_cols)


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    eps: int,
    by: str | None = None,
    suffix: str = "_r",
    bin_width: int | None = None,
) -> DataFrame:
    """Numeric band join: pairs with ``|l.on - r.on| <= eps`` (the
    tolerance-match shape — mass-spec m/z alignment, timestamp fuzz).

    Delegates to :func:`point_in_interval_join` with the right side
    widened to ``[v - eps, v + eps]``: the left side stays point-binned
    (no fan-out), the right side pays ``2*eps/W + 1`` bins per row, and
    the emit-once property is free (a point meets an interval in exactly
    one bin).  ``bin_width`` defaults to ``2*eps + 1`` — each widened
    interval then spans at most two bins, the fan-out sweet spot.
    """
    if eps < 0:
        raise ValueError(f"band_join: eps must be >= 0, got {eps}")
    reserved = {"_bs", "_be"} & set(right.columns)
    if reserved:
        raise ValueError(
            f"band_join: right columns collide with the widened-bound "
            f"working names: {sorted(reserved)}"
        )
    w = bin_width if bin_width is not None else 2 * eps + 1
    widened = right.withColumn("_bs", F.col(on).cast("bigint") - eps).withColumn(
        "_be", F.col(on).cast("bigint") + eps
    )
    out = point_in_interval_join(
        left, widened, on=on, by=by, bounds=("_bs", "_be"),
        bin_width=w, suffix=suffix,
    )
    return out.drop("_bs" + suffix, "_be" + suffix)
