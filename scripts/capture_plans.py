"""Capture `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files the
optimization rounds commit alongside the code.

Usage: python scripts/capture_plans.py <tag> <suffix> q_a,q_b [sf_dir]
e.g.   python scripts/capture_plans.py r13 before q_setsim_pairs
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_scripts_spark.session import get_spark

import __spark_entry__ as entrymod

tag, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
names = [n.strip() for n in names_csv.split(",") if n.strip()]

spark = get_spark("plan-capture")
queries = entrymod.queries()
unknown = [n for n in names if n not in queries]
if unknown:
    sys.exit(f"capture_plans: not registered: {unknown}")

out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
out_dir.mkdir(parents=True, exist_ok=True)
for name in names:
    df = queries[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    path = out_dir / f"{name}_{suffix}.txt"
    path.write_text(plan)
    n_exch = plan.count("Exchange")
    print(f"{name}: {len(plan)} chars, {n_exch} Exchange -> {path}")
spark.stop()
