"""Simulate the driver's verify run: a VANILLA SparkSession (none of our
session-factory configs), entry() smoke at sf0.001, then every oracle query
at the driver's sf0.01 against DuckDB — exactly the external contract.

Usage: python scripts/driver_sim.py [sf_dir] [--only q_a,q_b]
                                    [--master local[N]] [--shuffle N]
--only restricts the sweep to the named queries (same strictness) — the
fast targeted check for a flip wave; the FULL run before a
behavior-touching commit stays the rule.  --master/--shuffle override
the session shape for partitioning-independence stress runs (r11 pinned
the full surface green under local[4]/shuffle=7 — an exact-arithmetic
regression that only shows under odd partition counts reproduces with
these flags)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.parity import compare, duckdb_con

args = sys.argv[1:]


def _take_flag(name: str) -> str | None:
    """Pop `name <value>` from args; loud on a missing/flag-shaped value
    (a forgotten value would silently eat the next flag and shift the
    positional sf_dir — the confusing-downstream-failure shape the
    --only validation exists to prevent)."""
    if name not in args:
        return None
    i = args.index(name)
    if i + 1 >= len(args) or args[i + 1].startswith("--"):
        sys.exit(f"driver_sim: {name} needs a value")
    value = args[i + 1]
    del args[i:i + 2]
    return value


_only_raw = _take_flag("--only")
only: set[str] = (
    {t.strip() for t in _only_raw.split(",") if t.strip()} if _only_raw else set()
)
if _only_raw and not only:
    sys.exit("driver_sim: --only got an empty query list")
master = _take_flag("--master") or "local[8]"
shuffle = _take_flag("--shuffle")
for a in args[1:]:
    sys.exit(f"driver_sim: unexpected argument {a!r}")
SF = args[0] if args else "/root/testdata/sf0.01"

builder = SparkSession.builder.master(master).appName("driver-sim")
if shuffle is not None:
    builder = builder.config("spark.sql.shuffle.partitions", shuffle)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

rows = entrymod.entry(spark).collect()
print(f"entry(): {len(rows)} rows; first={rows[0] if rows else None}", flush=True)

con = duckdb_con(SF)
queries, oracles = entrymod.queries(), entrymod.oracle_sql()
if only:
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently matching nothing would print a clean
        # ALL OK over an empty sweep — the exact wrong signal
        sys.exit(f"--only names not registered: {sorted(unknown)}")
    queries = {k: v for k, v in queries.items() if k in only}
results = {}
for name in sorted(queries):
    t0 = time.time()
    try:
        pdf = queries[name](spark, SF).toPandas()
        if name in oracles:
            problems = compare(pdf, con.execute(oracles[name]).fetchdf())
            results[name] = {"status": "MATCH" if not problems else "MISMATCH", "detail": problems[:2], "rows": len(pdf)}
        else:
            results[name] = {"status": "ROWS_ONLY", "rows": len(pdf)}
    except Exception as e:  # noqa: BLE001
        results[name] = {"status": "ERROR", "detail": [str(e).split("\n")[0][:300]]}
    results[name]["sec"] = round(time.time() - t0, 2)
    print(f"{results[name]['status']:9s} {name} ({results[name]['sec']}s)", flush=True)

bad = {k: v for k, v in results.items() if v["status"] not in ("MATCH", "ROWS_ONLY")}
print(json.dumps({"total": len(results), "bad": len(bad)}))
if bad:
    print(json.dumps(bad, indent=2))
    sys.exit(1)
print("ALL OK")
