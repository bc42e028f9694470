"""Per-group simple linear regression — exact moment sums, one shuffle.

The corpus-analytics layer scores documents (quality, perplexity,
repetition); what it lacks is the TREND report a data operator runs over
those scores: "is quality drifting with document length per source?",
"does token count predict dedup survival per domain?".  Grouped ordinary
least squares answers those with one aggregation.

Engine-portable exactness, the repo's standard recipe:

* the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as
  DECIMAL(38,0) over integer inputs — order-independent and exact, so
  any partitioning gives bit-identical sums (a float accumulation would
  make the oracle comparison depend on Spark's reduction tree);
* the closed forms divide those exact integers as doubles and round to
  9 dp — the same 9-dp division/log parity the PSI report pins between
  the JVM and DuckDB libm;
* 38-digit overflow is loud on every config: ANSI mode (the Spark 4
  default) throws NUMERIC_VALUE_OUT_OF_RANGE at the decimal op itself,
  and under non-ANSI (where decimal overflow NULLs silently — the known
  trap) the in-plan raise_error guard fires instead.

Degenerate groups follow SQL `regr_*` semantics: n == 0 emits nothing
(no group), zero x-variance yields NULL slope/intercept/r2 (vertical
line), zero y-variance with positive x-variance yields slope 0 and r2
NULL (0/0 in the r² quotient — DuckDB's regr_r2 agrees).

One `groupBy` with map-side combine — at 100 TB this is the cheapest
shape a regression can take: no second pass, no per-group sort, no
residual materialization.  Float inputs are rejected loudly: snap to a
fixed-point integer grid first (the exactness contract is the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exactness import require_integral_columns

_D = "decimal(38,0)"


def _guard(expr):
    """NULL out of an exact decimal step with non-null inputs means a
    38-digit overflow — raise instead of emitting a silently-NULL stat.
    (Inputs are non-null by construction here: n>0 rows carry non-null
    moments, so any NULL IS the overflow.)"""
    return F.when(
        expr.isNull(),
        F.raise_error(
            F.lit("grouped_ols: exact moment arithmetic overflowed decimal(38,0)")
        ),
    ).otherwise(expr)


def grouped_ols(
    df: DataFrame, y: str, x: str, by: list[str] | None = None
) -> DataFrame:
    """Per-group OLS of `y` on `x`: (by..., n, slope, intercept, r2).

    NULL x or y rows are excluded pairwise (both moments must see the
    same rows or the normal equations stop being consistent).
    """
    require_integral_columns(df, [x, y], "grouped_ols")
    by = by or []
    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    xd = F.when(both, F.col(x).cast(_D))
    yd = F.when(both, F.col(y).cast(_D))

    def prod(a, b):
        # per-row product overflow NULLs under non-ANSI and would be
        # silently SKIPPED by sum while n still counts the row — the
        # worst failure shape (a plausible, wrong regression).  Raise.
        p = a * b
        return F.when(
            both & p.isNull(),
            F.raise_error(
                F.lit("grouped_ols: per-row moment product overflowed decimal(38,0)")
            ),
        ).otherwise(p)

    sums = df.groupBy(*by).agg(
        F.count(F.when(both, F.lit(1))).alias("n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(prod(xd, yd)).alias("_sxy"),
        F.sum(prod(xd, xd)).alias("_sxx"),
        F.sum(prod(yd, yd)).alias("_syy"),
    )
    sums = sums.where(F.col("n") > 0)

    n, sx, sy = F.col("n").cast(_D), F.col("_sx"), F.col("_sy")
    # exact integer numerators/denominators; division is the ONLY float
    # step.  Decimal sums AND decimal products return NULL on overflow
    # (the silent Spark trap), so every exact intermediate gets the loud
    # guard before the cast to double.
    #
    # Known boundary (kept deliberately): the 9-dp round here is of a
    # FLOAT quotient, which the r11 sweep proved engine-divergent when
    # the true ratio terminates at exactly 10 decimal digits (see
    # embedding_covariance's exact-e9 law).  It stays float here because
    # (a) the denominators (varx, n·varx, varx·vary) are data-shaped
    # moment combinations, not structural powers of ten, so a tie is
    # coincidental, and (b) intercept/r2 CANNOT go exact within
    # DECIMAL(38,0): the exact forms need sy·varx and covn² (~10⁶⁰ at
    # the design point).  The oracle rounds the bit-identical double the
    # same way, so only a true 10-digit tie can diverge.
    sums = sums.withColumn(
        "_covn", _guard(n * F.col("_sxy") - sx * sy)
    ).withColumn(
        "_varx", _guard(n * F.col("_sxx") - sx * sx)
    ).withColumn(
        "_vary", _guard(n * F.col("_syy") - sy * sy)
    )
    cov_n = F.col("_covn").cast("double")
    var_x = F.col("_varx").cast("double")
    var_y = F.col("_vary").cast("double")

    slope = F.when(var_x > 0, F.round(cov_n / var_x, 9))
    intercept = F.when(
        var_x > 0,
        F.round((sy.cast("double") - (cov_n / var_x) * sx.cast("double")) / n.cast("double"), 9),
    )
    r2 = F.when((var_x > 0) & (var_y > 0), F.round(cov_n * cov_n / (var_x * var_y), 9))

    return sums.select(
        *by,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
