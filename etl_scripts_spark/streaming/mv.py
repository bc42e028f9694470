"""Streaming materialized-view maintenance — exactly-once rollup refresh.

The reference's dropbox daemons re-derive summary state on every batch
arrival (`register-all.py` re-walks the store).  The streaming-native
form: a file stream of change-feed rows (`sinks/cdc.snapshot_changes`
output, or any feed with `_change_type`) drives
`sinks/materialized.refresh_rollup` through `foreachBatch`, and every
micro-batch's effect commits through the SAME CAS manifest that
publishes the new rollup snapshot (`sinks/commit.try_publish_version`).

Exactly-once without trusting the sink: Structured Streaming replays a
micro-batch after a crash, and a replayed delta applied twice DOUBLES
the rollup — the classic foreachBatch trap.  The applied `batch_id`
rides inside the committed manifest (`extra={"batch_id": ...}`), so the
idempotence check ("was this batch already folded in?") and the data
pointer are one atomic unit: a replayed batch sees its own id at (or
below) the latest manifest and skips; a crash BEFORE publish left no
effect to double.  This is the Delta `txn`/`idempotent writes` pattern
on the repo's manifest chain.

Feed files must arrive in causal order: Spark's file source orders
batches by modification time, and the feed's semantics are sequential
(a delete can only follow the insert it removes).  A producer that
copies files in with skewed mtimes (rsync -t, clock jumps) can surface
a delete before its insert; the refresh then fails LOUDLY with the
negative-count raise — by design the stream wedges rather than commits
a wrong table, and the fix is re-landing the files in order (the
already-applied prefix no-ops via the batch watermark).  Producers that
write through `snapshot_changes` + sequential file lands (this module's
intended pairing) satisfy the requirement for free.

One checkpoint per table lifetime: batch ids are per-checkpoint, so a
FRESH checkpoint over the same feed directory replays every file from
batch 0 — the watermark check correctly skips those replays, which also
means a genuinely new stream must start against a fresh table root (or
the old ids shadow its first batches).  The same rule Delta's `txn`
appId/version pair imposes.

Scale: each micro-batch pays O(|groups| + |batch|) (see materialized.py)
— the base table never appears; at 100 TB the rollup stays a small table
maintained at feed speed.  The drain uses Trigger.AvailableNow +
maxFilesPerTrigger so a backlog becomes several serialized refreshes,
each CAS-published — the maintenance loop owns the table, so a CAS loss
raises (a foreign writer on a maintained rollup is a deployment bug,
not a retryable race).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sinks.commit import (
    latest_committed_version,
    read_version,
    try_publish_version,
    version_record,
)
from ..sinks.files import staged_write
from ..sinks.materialized import refresh_rollup, rollup_table


def apply_feed_batch(
    batch: DataFrame,
    batch_id: int,
    root: str,
    group_keys: list[str],
    sum_cols: list[str],
) -> bool:
    """Fold one micro-batch of feed rows into the committed rollup at
    `root`; returns False when the batch id was already applied (replay).

    Usable directly as the foreachBatch body, and directly testable —
    crash-replay is just calling it twice with the same id.
    """
    v = latest_committed_version(root)
    if v > 0 and version_record(root, v).get("batch_id", -1) >= batch_id:
        return False  # replayed batch: its effect is already committed
    current = (
        read_version(batch.sparkSession, root, v)
        if v > 0
        else rollup_table(batch.drop("_change_type").limit(0), group_keys, sum_cols)
    )
    new_rollup = refresh_rollup(current, batch, group_keys, sum_cols)
    dest = os.path.join(root, "data", f"v{v + 1}-{uuid.uuid4().hex}")
    staged_write(new_rollup, dest)
    if not try_publish_version(
        root, v + 1, dest, base=v, extra={"batch_id": batch_id}
    ):
        raise RuntimeError(
            f"rollup maintenance lost CAS on {root} v{v + 1}: a foreign "
            "writer is committing to a stream-maintained table"
        )
    return True


def rollup_maintenance_available_now(
    spark: SparkSession,
    feed_path: str,
    feed_schema: T.StructType | str,
    root: str,
    group_keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain every feed file currently in `feed_path` into the committed
    rollup at `root` (one refresh per `max_files_per_trigger` files),
    then return the resulting rollup DataFrame."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_feed_batch(batch, batch_id, root, group_keys, sum_cols)

    q = (
        spark.readStream.schema(feed_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_path)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    committed = read_version(spark, root)
    if committed is not None:
        return committed
    # zero feed files drained and nothing previously committed: honor the
    # "returns the rollup" contract with the (empty) rollup shape rather
    # than a None that crashes the caller far from the cause
    empty_base = spark.createDataFrame([], feed_schema).drop("_change_type")
    return rollup_table(empty_base, group_keys, sum_cols)
