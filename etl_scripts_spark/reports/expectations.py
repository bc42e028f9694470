"""Declarative data-quality expectations — validate, count, quarantine.

The reference validates relentlessly but imperatively: barcode checksum
loops, mandatory-column checks, paired-file parity, TSV field validation
(`register-*` scripts each carry their own ad-hoc loop).  The engine
form is a RULE SET evaluated in one pass — the Delta Live Tables
"expectations" shape:

* `expectation_report(df, rules)` — per-rule pass/fail counts and fail
  rate, ONE aggregation over ONE scan (every rule is a conditional
  count in the same agg — never one pass per rule);
* `quarantine_split(df, rules)` — (good, bad) where bad rows carry a
  `violations` array naming every rule they fail; one projection, no
  join, no second scan of the good side;
* rows and rules never multiply: a million rules would be a config bug,
  a million rows × 20 rules is one codegen'd projection.

Three-valued logic is pinned CLOSED: a rule passes iff its predicate is
TRUE — a NULL predicate result (NULL input to a comparison) FAILS.  The
open interpretation (`filter(NOT pred)` letting NULLs through) is the
classic silent data-quality hole: the malformed row that made the
predicate unevaluatable is exactly the row the rule exists to catch.

Rule names must be unique and non-empty — the report keys on them and
the quarantine array quotes them back to the operator.

Scale: both entry points are map-only until the report's final
groupBy-less aggregate (a single partial-agg reduce).  At 100 TB the
report costs one scan and the split is free on top of whatever sink
consumes it.  100 % engine-portable: predicates are Column expressions;
the DuckDB twin (`oracle.expectation_report_sql`) takes the same rules
as SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exactness import e9_div_expr


import re

_NAME_RE = re.compile(r"^[A-Za-z0-9_\-]+$")


def _validate(rules: list[tuple[str, Column]]) -> None:
    names = [n for n, _ in rules]
    if not rules:
        raise ValueError("expectations: empty rule set")
    if len(set(names)) != len(names):
        raise ValueError(f"expectations: duplicate rule names: {names}")
    bad = [n for n in names if not _NAME_RE.match(n or "")]
    if bad:
        # names become column aliases in the report's wide aggregate —
        # a dot would silently parse as a nested-field reference
        raise ValueError(f"expectations: rule names must match [A-Za-z0-9_-]+: {bad}")


def _passes(pred: Column) -> Column:
    """Closed-world pass: TRUE passes, FALSE and NULL fail."""
    return pred.eqNullSafe(F.lit(True))


def expectation_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """(rule, n_pass, n_fail, fail_rate) — one row per rule, one scan.

    fail_rate is rounded to 9 dp (the repo's cross-engine division
    parity recipe); an empty input emits every rule with zero counts —
    "no data" and "no failures" stay distinguishable downstream.
    """
    _validate(rules)
    aggs = []
    for name, pred in rules:
        p = _passes(pred)
        aggs.append(F.count(F.when(p, F.lit(1))).alias(f"_p_{name}"))
        aggs.append(F.count(F.when(~p, F.lit(1))).alias(f"_f_{name}"))
    wide = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"_p_{name}").alias("n_pass"),
            F.col(f"_f_{name}").alias("n_fail"),
        )
        for name, _ in rules
    ]
    out = wide.select(F.explode(F.array(*per_rule)).alias("r")).select("r.*")
    total = F.col("n_pass") + F.col("n_fail")
    # fail_rate rounds to 9 dp in EXACT integer arithmetic (the shared
    # exactness.e9_div_expr law): rounding the float quotient is
    # engine-divergent whenever n_fail/total terminates at exactly 10
    # decimal digits — and total here IS the table row count, the one
    # quantity generated data makes 2^a·5^b-shaped.  DECIMAL(38,0)
    # arithmetic keeps the law exact past BIGINT-sized tables.
    rate_e9 = F.expr(
        e9_div_expr(
            "CAST(n_fail AS DECIMAL(38,0))",
            10**9,
            "(CAST(n_pass AS DECIMAL(38,0)) + n_fail)",
            "expectations fail_rate",
            signed=False,
        )
    )
    return out.withColumn(
        "fail_rate",
        F.when(total > 0, rate_e9.cast("double") / F.lit(1e9)).otherwise(F.lit(0.0)),
    )


def with_violations(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Every input row + a `violations` array naming each failed rule
    (empty array = clean row).  One projection, map-only."""
    _validate(rules)
    if "violations" in df.columns:
        raise ValueError("expectations: input already has a `violations` column")
    vio = F.array_compact(
        F.array(*[F.when(~_passes(pred), F.lit(name)) for name, pred in rules])
    )
    return df.withColumn("violations", vio)


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows drop the violations column (they have
    none); bad rows keep the names of every rule they failed."""
    annotated = with_violations(df, rules)
    good = annotated.where(F.size("violations") == 0).drop("violations")
    bad = annotated.where(F.size("violations") > 0)
    return good, bad
