"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL, normalizes both frames (columns
sorted by name, rows sorted by all columns), and compares values exactly —
the same strictness as an order-insensitive value hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _na_canonical(v) -> str:
    """Engine-independent string form: DuckDB's fetchdf renders a NULL in
    an object column (e.g. nullable BOOLEAN) as float NaN while Spark's
    toPandas gives None — astype(str) would split them into 'nan' vs
    'None' and misalign the row sort.  Lists/arrays pass through (pd.isna
    on them is ambiguous)."""
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_na_canonical)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def _kind(series: pd.Series) -> str:
    """Coarse type fingerprint for hash-compatibility: the driver hashes
    serialized values, so Decimal-vs-int or float-vs-int skew (e.g. DuckDB
    HUGEINT from sum(BIGINT)) breaks the hash even when values compare equal.
    Buckets: i=integer, f=float, b=bool, s=string, t=datetime, o=other."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "t"
    for v in series:
        if v is None:
            continue
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            if math.isnan(v):
                continue
            return "f"
        if isinstance(v, str):
            return "s"
        return type(v).__name__
    return "?"


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a = normalize(spark_pdf)
    b = normalize(oracle_pdf)
    for col in a.columns:
        ka, kb = _kind(spark_pdf[col]), _kind(oracle_pdf[col])
        if "?" not in (ka, kb) and ka != kb:
            problems.append(
                f"column {col!r}: type kind differs (hash-unsafe): spark={ka} oracle={kb} "
                f"(spark dtype={spark_pdf[col].dtype}, oracle dtype={oracle_pdf[col].dtype})"
            )
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {col!r}: {len(bad)}/{len(av)} values differ; first at sorted row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return problems


def plan_of(df) -> str:
    """Capture `df.explain("formatted")` output as a string (the plan-pin
    helper shared by shape tests)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
