"""Dependency-free integer laws shared by BOTH engines' codegen.

The Spark expression builders (exactness.py, which imports pyspark) and
the DuckDB twin builders (oracle.py, whose contract is plain SQL string
building with no heavy imports) both need these constants/folds — a
private copy on either side is exactly how the two engines would drift
apart silently, and importing exactness from oracle would drag pyspark
into a pure-SQL module.  This module may import nothing but the stdlib.
"""

from __future__ import annotations

import math

#: 2^53: the largest integer magnitude a double represents exactly.  The
#: exact-e9 envelope is bounded here (not at a round 9e15) so the final
#: cast-to-double of the e9 BIGINT is an EXACT conversion in every
#: regime — including when the envelope product itself overflows
#: DECIMAL(38,0) (den ≥ 10^38/2^53 ≈ 1.11e22), where the quotient
#: provably stays < 2^53 because the numerator is bounded by 10^38.
E9_ENVELOPE = 1 << 53


def cov_scale(grid: int) -> tuple[int, int]:
    """(mult, den_scale) for the exact-e9 covariance rounding: folds
    gcd(10⁹, grid²) so the default grid (10⁶) needs NO numerator growth.

    THE one copy of the fold — similarity.embedding_covariance (Spark)
    and oracle.embedding_covariance_sql (DuckDB) both import it, so the
    two engines cannot silently disagree on the cov rounding grid."""
    _gcd = math.gcd(10**9, grid * grid)
    return 10**9 // _gcd, (grid * grid) // _gcd
