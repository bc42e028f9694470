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
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical home of the engine-shared integer laws: exact_math.py
# (dependency-free, so oracle.py's pure-SQL-builder module imports the
# SAME copy without dragging pyspark in transitively); re-exported here
# for the Spark-side callers.
from .exact_math import E9_ENVELOPE, cov_scale  # noqa: F401  (re-export)

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


# --- exact 9-dp ratio rounding (the float-tie fix) --------------------------


def e9_div_expr(
    num_sql: str, mult: int, den_sql: str, label: str, signed: bool = True
) -> str:
    """Spark SQL expression string: round-half-away(num·mult / den) as a
    BIGINT in units of 10⁻⁹ — divide the result by 1e9 for the value.

    THE one copy of the exact-e9 law (used by embedding_covariance both
    paths, expectations.fail_rate, benchmark contamination; DuckDB twin:
    oracle.e9_div_sql — the two must stay in lock-step): rounding a
    FLOAT quotient is engine-divergent on exact 10-digit decimal ties
    (r11 find), so the rounding happens on exact integers — value-equal
    to (2·|num|·mult + den) div (2·den) re-signed (the DuckDB twin's
    form; HUGEINT has the headroom for the doubling), computed here via
    the remainder form below; both engines truncate integral division
    toward zero.

    Loudness: a NULL anywhere (a NULL input, or DECIMAL(38,0) overflow —
    indistinguishable at this point, the message names both) raises
    instead of propagating.  The guard products use try_multiply so they
    NULL on overflow in BOTH ANSI modes — a plain `*` would throw a
    misattributed NUMERIC_VALUE_OUT_OF_RANGE in ANSI sessions on the
    GUARD arithmetic even when the value itself is fine (real at scale:
    covariance's den = n²·cov_den passes 10^38/2^53 ≈ 1.11e22 around
    n ~ 10¹¹ rows).  The envelope bounds the rounded magnitude at 2^53
    (E9_ENVELOPE, |value| ≤ ~9.007·10⁶): Spark's decimal `div` WRAPS
    silently past 2^63, and any BIGINT ≤ 2^53 casts to double EXACTLY,
    so the final /10⁹ is the one float operation and it is exact.  When
    the envelope product itself overflows (den ≥ 10^38/2^53) the guard
    is skipped but the bound still holds: the numerator is < 10^38, so
    the quotient is provably < 2^53 — the exactness claim is
    unconditional.  Rounding is REMAINDER-based (q = g div den;
    round up iff r ≥ den − r) rather than the textbook (2·g + den) div
    (2·den): the doubled products would overflow DECIMAL(38,0) for
    g ≥ 5·10³⁷ — a legal magnitude at extreme den — while q·den ≤ g and
    den − r cannot overflow at any guarded input.
    """
    a = f"try_multiply(abs({num_sql}), CAST({mult} AS DECIMAL(38,0)))"
    env = f"try_multiply(({den_sql}), CAST({E9_ENVELOPE} AS DECIMAL(38,0)))"
    g = (
        f"CASE WHEN {a} IS NULL THEN CAST(raise_error("
        f"'{label}: exact-e9 numerator is NULL (NULL input or DECIMAL(38,0) overflow); check inputs or lower grid') AS DECIMAL(38,0)) "
        f"WHEN ({den_sql}) IS NULL THEN CAST(raise_error("
        f"'{label}: exact-e9 denominator is NULL (NULL input or DECIMAL(38,0) overflow upstream); check inputs or lower grid') AS DECIMAL(38,0)) "
        f"WHEN {env} IS NOT NULL AND {a} > {env} THEN CAST(raise_error("
        f"'{label}: |value| exceeds the exact 9-dp envelope (2^53/1e9); lower grid or center the input') AS DECIMAL(38,0)) "
        f"ELSE {a} END"
    )
    # let-bindings via single-element transform() lambdas: the guarded g
    # CASE would otherwise re-inline COMBINATORIALLY (q uses g, r uses g
    # and q, e9 uses q and r twice, the final guard uses e9 twice — ~10
    # textual copies of g, ~9 KB of SQL and 31 raise_errors per call
    # site, all multiplied per output column).  Binding g/q/e9 once
    # keeps the expression linear (~1.5 KB, 4 raise_errors); the HOF
    # lambdas cost interpreted evaluation, which is irrelevant here —
    # every e9 site projects a post-aggregate output of at most
    # dims²/rule-count rows.
    e9 = (
        f"element_at(transform(array({g}), _e9g -> "
        f"element_at(transform(array(_e9g div ({den_sql})), _e9q -> "
        f"_e9q + (CASE WHEN (_e9g - _e9q * ({den_sql})) >= "
        f"({den_sql}) - (_e9g - _e9q * ({den_sql})) THEN 1 ELSE 0 END)"
        f"), 1)), 1)"
    )
    guarded = (
        f"element_at(transform(array({e9}), _e9v -> "
        f"CASE WHEN _e9v IS NULL THEN CAST(raise_error("
        f"'{label}: exact-e9 arithmetic overflowed DECIMAL(38,0); lower grid') AS BIGINT) "
        f"ELSE _e9v END), 1)"
    )
    if signed:
        return f"(CAST(CASE WHEN ({num_sql}) < 0 THEN -1 ELSE 1 END AS BIGINT) * {guarded})"
    return guarded


# --- order-independent table fingerprint -----------------------------------

#: Mersenne prime 2^61-1: the row-hash sum is reduced mod this so the
#: fingerprint stays a BIGINT in every engine (the raw sum of 60-bit
#: hashes passes 2^63 after ~8 rows).
FP_MOD = (1 << 61) - 1

#: Types whose string rendering is identical in Spark and DuckDB.  Doubles
#: (engine-specific shortest-roundtrip formatting), decimals (trailing-zero
#: conventions) and timestamps (zone/format) are excluded — canonicalize
#: them to strings or fixed-point integers first.
_RENDER_STABLE = (*_INTEGRAL, T.StringType, T.BooleanType)


def row_hash(cols: list[str]):
    """60-bit content hash of one row: md5 over the canonical encoding
    `v<value>` per column (NULL → \\x01 — distinct from any value token),
    joined by \\x1f.  The prefix keeps NULL, '', and absent distinguishable;
    the unit separator cannot be produced by the allowed types, so column
    boundaries never ambiguate.  First 15 hex chars read as a BIGINT —
    the same ('0x' || substr(md5(..),1,15))::BIGINT law DuckDB replays."""
    toks = [
        F.when(F.col(c).isNull(), F.lit("\x01")).otherwise(
            F.concat(F.lit("v"), F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.conv(F.substring(F.md5(F.concat_ws("\x1f", *toks)), 1, 15), 16, 10).cast(
        "bigint"
    )


def table_fingerprint(
    df: DataFrame, cols: list[str] | None = None, by: list[str] | None = None
) -> DataFrame:
    """Order- and partitioning-independent content checksum of a table
    (optionally per `by` group): (n_rows, fp_sum, fp_xor).

    The lakehouse verification primitive the CAS/CDC/SCD2 machinery wants:
    after a migration, compaction, engine swap, or snapshot restore, two
    tables are content-equal-as-multisets iff all three values match per
    group (fp_sum = Σ row-hash mod 2^61−1 catches multiplicity changes the
    xor cancels, e.g. a row duplicated twice; fp_xor catches pairs of sums
    that collide; n_rows anchors both).  No sort, no collect: one md5
    projection and ONE aggregation with map-side combine — at 100 TB this
    is the cheapest possible full-content comparison, and per-`by`
    fingerprints (e.g. by partition key) narrow any diff to the partitions
    that actually changed, so re-verification after an incremental load
    touches kilobytes, not the table.

    Restricted to render-stable column types (integers, strings, booleans)
    — see _RENDER_STABLE; reference analogue: the reference compares CRC32
    checksum files per dataset (checksum-file parse, SURVEY S12), this is
    the same contract lifted to engine-portable table scope.
    """
    by = by or []
    if cols is None:
        cols = [c for c in df.columns if c not in by]
    if not cols:
        raise ValueError("table_fingerprint: no content columns")
    for c in [*cols, *by]:
        dt = df.schema[c].dataType
        if not isinstance(dt, _RENDER_STABLE):
            raise ValueError(
                f"table_fingerprint: column `{c}` is {dt.simpleString()}: only "
                "integer/string/boolean render identically across engines — "
                "canonicalize floats/decimals/timestamps to strings or "
                "fixed-point integers first"
            )
    if "_h" in by:
        raise ValueError("table_fingerprint: `_h` collides with the staged hash")
    staged = df.select(*by, row_hash(cols).alias("_h"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            (F.sum(F.col("_h").cast("decimal(38,0)")) % F.lit(FP_MOD)).cast("long"),
            F.lit(0),
        ).alias("fp_sum"),
        F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).alias("fp_xor"),
    ]
    return staged.groupBy(*by).agg(*aggs) if by else staged.agg(*aggs)
