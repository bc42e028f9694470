"""Deterministic sequential ID allocation — replaces the reference's probe loops.

Every dropbox allocates collision-free identifiers with a mutable-state loop
(`while id in existing or getSampleForUpdate(id): n += 1` — SURVEY §2.6:
register-vcf.py:98-110, etl_msconvert.py:432-447, register-nanopore.py:70-94).
That pattern cannot scale-out: it serializes on shared state.  The Spark-first
replacement is `row_number()` over a per-partition-key window joined against
the sink's current max — deterministic, collision-free by construction, and
shuffle-partitioned by the allocation key so 1000 executors allocate in
parallel without coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_sequence(
    incoming: DataFrame,
    existing_max: DataFrame,
    partition_col: str,
    order_cols: list[str],
    out_col: str = "n",
) -> DataFrame:
    """Assign each incoming row the next free integer per partition key.

    `existing_max` must have columns (partition_col, max_n) — the sink's
    current high-water mark per key (compute with groupBy().agg(max)).
    Result adds `out_col` = max_n + row_number() within the key.
    """
    w = Window.partitionBy(partition_col).orderBy(*[F.col(c) for c in order_cols])
    return (
        incoming.join(F.broadcast(existing_max), partition_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("max_n"), F.lit(0)) + F.row_number().over(w),
        )
        .drop("max_n")
    )


def experiment_code(project: F.Column, n: F.Column) -> F.Column:
    """'{project}E{n}' (register-fastq-dropbox.py:109-110)."""
    return F.concat(project, F.lit("E"), n.cast("string"))


def run_sample_code(prefix: str, n: F.Column, parent_barcode: F.Column) -> F.Column:
    """'MS{n}{code}' / 'NGS{n}{code}' / 'VC{n}{code}'-style derived-run codes
    (etl_msconvert.py:432-447; first run carries no number, like NGS runs at
    register-fastq-dropbox.py:114)."""
    return F.concat(
        F.lit(prefix),
        F.when(n > 1, n.cast("string")).otherwise(F.lit("")),
        parent_barcode,
    )


def padded_patient_id(prefix: str, n: F.Column, width: int = 5) -> F.Column:
    """'QPATH-PAT-00042' zero-padded IDs (register-iontorrent-data.py:445-450)."""
    return F.concat(F.lit(prefix), F.lpad(n.cast("string"), width, "0"))
