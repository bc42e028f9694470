"""The exact-e9 rounding law (exactness.e9_div_expr / oracle.e9_div_sql):
envelope regimes, loud-NULL semantics, and the single-copy contracts the
r11 ADVICE pinned — the cov-grid gcd fold lives ONCE (exactness.cov_scale,
imported by both similarity.py and oracle.py), and the envelope bound is
2^53 so the final cast-to-double is an exact conversion in EVERY regime,
including when the envelope product itself overflows DECIMAL(38,0)."""

from __future__ import annotations

import pytest

from etl_scripts_spark import oracle
from etl_scripts_spark.exactness import E9_ENVELOPE, cov_scale, e9_div_expr


def _eval(spark, expr_sql: str):
    return spark.sql(f"SELECT {expr_sql} AS v").collect()[0]["v"]


def test_cov_scale_is_the_single_shared_copy():
    from etl_scripts_spark.operators import similarity

    # the Spark side imports the exactness copy, not a private twin
    assert similarity._cov_scale is cov_scale
    # the oracle builder folds the SAME values for a non-default grid:
    # grid 2000 → grid² = 4·10⁶ = 2⁸·5⁶, gcd(10⁹, 4·10⁶) = 4·10⁶ → (250, 1)
    assert cov_scale(2000) == (250, 1)
    sql = oracle.embedding_covariance_sql("SELECT embedding FROM e", grid=2000)
    assert "* 250)" in sql and "* 1::HUGEINT" in sql
    # default grid needs no numerator growth (the fold's whole point)
    assert cov_scale(10**6) == (1, 1000)


def test_oracle_module_is_pyspark_free():
    """oracle.py's contract is pure DuckDB SQL string building; the
    shared fold must come from the dependency-free exact_math module,
    not exactness (which imports pyspark) — pinned by importing oracle
    and building the covariance twin in a subprocess where pyspark is
    blocked at the meta-path."""
    import subprocess
    import sys

    # find_spec, not the legacy find_module/load_module pair: the import
    # system's fallback to the legacy protocol was removed in Python 3.12,
    # where a find_module-only finder is silently skipped and this pin
    # would pass vacuously (r12 ADVICE).  The blocker is itself exercised
    # first — if `import pyspark` succeeds, the guard is dead and the
    # subprocess fails loudly before touching oracle.
    code = (
        "import sys\n"
        "class B:\n"
        "    def find_spec(self, name, path=None, target=None):\n"
        "        if name == 'pyspark' or name.startswith('pyspark.'):\n"
        "            raise ModuleNotFoundError('pyspark blocked')\n"
        "        return None\n"
        "sys.meta_path.insert(0, B())\n"
        "try:\n"
        "    import pyspark\n"
        "except ModuleNotFoundError:\n"
        "    pass\n"
        "else:\n"
        "    raise AssertionError('meta-path blocker is not blocking')\n"
        "from etl_scripts_spark import oracle\n"
        "assert 'WITH src' in oracle.embedding_covariance_sql('SELECT 1')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd="/root/repo",
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]


def test_envelope_is_two_to_the_53():
    # 2^53 = the largest integer a double holds exactly; a round 9e15
    # bound leaves a regime where the claim is only "both engines round
    # identically", not "the conversion is exact"
    assert E9_ENVELOPE == 1 << 53 == 9007199254740992
    assert str(E9_ENVELOPE) in e9_div_expr("x", 1, "y", "t")


def test_envelope_boundary_passes_and_raises(spark):
    dec = "CAST({} AS DECIMAL(38,0))"
    # exactly at the envelope: passes, and the BIGINT→double cast is exact
    at = _eval(
        spark, e9_div_expr(dec.format(E9_ENVELOPE), 1, dec.format(1), "t")
    )
    assert at == E9_ENVELOPE
    assert int(float(at)) == E9_ENVELOPE  # exact double conversion
    # one past the envelope: loud raise, never a wrapped div
    with pytest.raises(Exception, match="exact 9-dp envelope"):
        _eval(
            spark,
            e9_div_expr(dec.format(E9_ENVELOPE + 1), 1, dec.format(1), "t"),
        )


def test_overflowed_envelope_regime_is_still_exact(spark):
    # den ≥ 10^38/2^53 ≈ 1.11e22 makes den·2^53 overflow DECIMAL(38,0)
    # → try_multiply NULLs it in BOTH ANSI modes (a plain `*` THROWS in
    # ANSI sessions on the guard arithmetic — a false raise at the n²
    # denominators ~10¹¹-row covariance reaches) → the magnitude guard
    # is skipped.  The bound still holds: numerator < 10^38 ⇒ quotient
    # < 2^53 ⇒ exact double.  This test runs in the ANSI-on session.
    dec = "CAST({} AS DECIMAL(38,0))"
    num, den = 10**37, 10**23
    got = _eval(spark, e9_div_expr(dec.format(num), 1, dec.format(den), "t"))
    assert got == num // den == 10**14  # exact division, no rounding term
    assert got < E9_ENVELOPE
    # extreme-g regime the doubling form could not reach: g ≥ 5·10³⁷
    # overflows (2·g + den) in DECIMAL(38,0); the remainder form rounds
    # it exactly — 7·10³⁷ / 2·10³⁷ = 3.5, a dead-center tie, half-away 4
    num2, den2 = 7 * 10**37, 2 * 10**37
    got2 = _eval(spark, e9_div_expr(dec.format(num2), 1, dec.format(den2), "t"))
    assert got2 == 4  # half-away on the exact tie, no doubled product


def test_rounding_is_half_away_on_exact_ties(spark):
    # the r11 law: 3/2 → 2, -3/2 → -2 (re-signed), 1/3 → 0, 2/3 → 1
    dec = "CAST({} AS DECIMAL(38,0))"
    cases = [(3, 2, 2), (-3, 2, -2), (1, 3, 0), (2, 3, 1), (5, 2, 3), (-5, 2, -3)]
    for num, den, want in cases:
        got = _eval(spark, e9_div_expr(dec.format(num), 1, dec.format(den), "t"))
        assert got == want, (num, den, got)


def test_duckdb_twin_survives_extreme_g_and_stays_value_equal(spark):
    # review find: the twin's old doubling form overflowed INT128 for
    # g ≥ ~8.5e37 — a magnitude the Spark side's skipped-envelope regime
    # legally reaches — so both copies now use the remainder form.
    # 9e37/2e37 = 4.5, a dead-center tie → half-away 5, both engines.
    import duckdb

    num, den = 9 * 10**37, 2 * 10**37
    got_duck = duckdb.sql(
        f"SELECT {oracle.e9_div_sql(f'{num}::HUGEINT', 1, f'{den}::HUGEINT')} AS v"
    ).fetchone()[0]
    assert got_duck == 5
    dec = "CAST({} AS DECIMAL(38,0))"
    got_spark = _eval(spark, e9_div_expr(dec.format(num), 1, dec.format(den), "t"))
    assert got_spark == 5 == got_duck


def test_null_denominator_names_both_causes(spark):
    # review find: a NULL denominator (DECIMAL(38,0) overflow upstream
    # in a non-ANSI session) used to fall through to the final
    # 'arithmetic overflowed; lower grid' raise — the same misdiagnosis
    # the numerator path was cured of.  The NULL must be DATA-dependent:
    # a literal NULL den gets folded by NullPropagation (`g div NULL` →
    # NULL without evaluating g) so the labeled branch would be
    # optimized away — which is fine, because production dens are
    # columns, where the runtime CASE walk reaches the branch.
    df = spark.range(1).selectExpr(
        "CAST(try_divide(id, id) AS DECIMAL(38,0)) AS den"  # 0/0 → NULL
    )
    with pytest.raises(Exception, match="denominator is NULL"):
        df.selectExpr(
            e9_div_expr("CAST(1 AS DECIMAL(38,0))", 1, "den", "t") + " AS v"
        ).collect()


def test_randomized_three_way_parity(spark):
    """2,000 random (num, den) pairs + 50 CONSTRUCTED dead-center ties,
    three ways: Spark e9_div_expr, DuckDB e9_div_sql, and a Python-int
    round-half-away reference (the ground truth both engines must hit).
    Random search cannot be trusted to find ties on its own (measure
    ~1e-12 at this range), hence the constructed k−0.5 block."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(12)
    cases = []
    for i in range(2000):
        den = rng.randint(1, 10**12)
        num = rng.randint(-den * 9 * 10**5, den * 9 * 10**5)
        cases.append((i, num, den))
    for i in range(50):  # num/den = k − 1/2 exactly, both signs
        den = 2 * rng.randint(1, 10**9)
        k = rng.randint(1, 10**6)
        num = (2 * k - 1) * (den // 2) * (1 if i % 2 else -1)
        cases.append((2000 + i, num, den))

    def ref(num: int, den: int) -> int:
        s = -1 if num < 0 else 1
        return s * ((2 * abs(num) + den) // (2 * den))

    want = {i: ref(n, d) for i, n, d in cases}

    from decimal import Decimal

    sdf = spark.createDataFrame(
        [(i, Decimal(n), Decimal(d)) for i, n, d in cases],
        "i long, num decimal(38,0), den decimal(38,0)",
    )
    got_spark = {
        r["i"]: r["v"]
        for r in sdf.selectExpr(
            "i", e9_div_expr("num", 1, "den", "fuzz") + " AS v"
        ).collect()
    }
    assert got_spark == want

    pdf = pd.DataFrame(cases, columns=["i", "num", "den"])
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = dict(
        con.execute(
            f"SELECT i, {oracle.e9_div_sql('num::HUGEINT', 1, 'den::HUGEINT')} FROM t"
        ).fetchall()
    )
    assert {i: int(v) for i, v in got_duck.items()} == want


def test_null_numerator_names_both_causes(spark):
    # a genuinely NULL input must not be misdiagnosed as a grid-scaling
    # problem — the message names NULL input AND overflow (they are
    # indistinguishable at this point: try_multiply NULLs on overflow
    # in both ANSI modes)
    with pytest.raises(Exception, match="NULL input or DECIMAL.38,0. overflow"):
        _eval(
            spark,
            e9_div_expr(
                "CAST(NULL AS DECIMAL(38,0))", 1, "CAST(1 AS DECIMAL(38,0))", "t"
            ),
        )


def test_numerator_overflow_raises_the_labeled_message_even_in_ansi(spark):
    # before try_multiply, ANSI sessions threw Spark's own
    # NUMERIC_VALUE_OUT_OF_RANGE at the num·mult product — loud but
    # misattributed; now both modes route through the labeled raise
    with pytest.raises(Exception, match="NULL input or DECIMAL.38,0. overflow"):
        _eval(
            spark,
            e9_div_expr(
                f"CAST({10**30} AS DECIMAL(38,0))",
                10**9,
                "CAST(1 AS DECIMAL(38,0))",
                "t",
            ),
        )
