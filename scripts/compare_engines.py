"""Time Spark queries against their DuckDB oracle twins at a given SF.

The reference publishes no benchmarks (BASELINE.md), so the closest
"single-node throughput at the same data scale" comparison available is
DuckDB — a state-of-the-art single-node engine — running the exact oracle
SQL on the same parquet.  Usage:

    python scripts/compare_engines.py [sf_dir] [q1 q2 ...]

Prints one markdown table row per query: spark_s, duckdb_s, ratio.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from etl_scripts_spark.session import get_spark
from tests.parity import duckdb_con


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "q_pricing_summary",
        "q_revenue_by_nation",
        "q_register_fastq",
        "q_lineage_roots",
        "q_word_count",
        "q_minhash_lsh_pairs",
        "q_near_dup_clusters",
        "q_corpus_curation",
        "q_simhash",
        "q_token_stats",
        "q_sequence_packing",
        "q_sessionize",
    ]
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark("compare-engines")
    spark.range(1000).selectExpr("sum(id)").collect()
    con = duckdb_con(sf_dir)
    print(f"| query | spark_s | duckdb_s | spark/duckdb |  (sf_dir={sf_dir})")
    print("|---|---|---|---|")
    tot_s = tot_d = 0.0
    for name in names:
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        s = time.time() - t0
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        d = time.time() - t0
        tot_s, tot_d = tot_s + s, tot_d + d
        print(f"| {name} | {s:.2f} | {d:.2f} | {s / max(d, 1e-9):.2f} |", flush=True)
    print(f"| **total** | {tot_s:.2f} | {tot_d:.2f} | {tot_s / tot_d:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
