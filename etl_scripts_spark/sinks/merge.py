"""MERGE-style idempotent upsert, emulated without a lakehouse dependency.

The reference's upsert-if-absent probes (`sample exists? reuse : create`,
register-bam.py:118-131 and every dropbox) map to Delta `MERGE INTO` in
production (SURVEY §2.7 W1).  The v1 image has no Delta jars, so this module
emulates MERGE relationally — anti-join + union — which is exactly the
logical plan MERGE compiles to for insert/update-all semantics.  Swap in
`delta.tables.DeltaTable.merge` behind the same signature when the jar is on
the classpath (import-gated below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only when delta-spark is installed
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except Exception:  # broad: any import failure means "no lakehouse"
    HAVE_DELTA = False


def dedupe_updates(updates: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Last-writer-wins within one batch (highest order_col per key)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return updates.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def merge_upsert(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, as a batch plan.

    Updates win on key collision; both inputs must share a schema.
    Idempotent: re-running with the same updates yields the same table.
    """
    kept = existing.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*existing.columns))


def insert_if_absent(existing: DataFrame, inserts: DataFrame, keys: list[str]) -> DataFrame:
    """WHEN NOT MATCHED INSERT only — duplicates become no-ops
    (register-mtb-data-dropbox.py:402-404 'already registered → drop')."""
    fresh = inserts.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(fresh.select(*existing.columns))
