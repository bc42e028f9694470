"""Streaming state-partition sizing.

A stateful streaming operator shards its state store — and spins up one
Python worker + Arrow channel per shard — according to
``spark.sql.shuffle.partitions`` *at query start*.  Unlike batch shuffles,
AQE cannot coalesce these at runtime (AQE is disabled for stateful
workloads), so the number must be chosen, not defaulted: size it to the
GROUP-KEY CARDINALITY and per-key state size, not to the input volume.

  - too many shards: fixed per-shard cost (state-store instance, Python
    worker round-trip, commit) dominates — measured 8.0 s → 2.8 s at sf0.1
    by going 32 → 8 shards for a 1500-key state;
  - too few shards: a shard's keys + state must fit one executor's memory,
    and parallelism caps at the shard count — at 10⁹ keys you want
    thousands.

Rule of thumb applied here: ``keys / shards`` ≈ 400 so Arrow batching and
state-store commits amortize (measured at sf0.1 on a 7500-key state:
~470 keys/shard ran 2.3× faster than 235 and 1.3× faster than 940),
bounded below by 4 for local parallelism and above by the session's
configured shuffle partitions.  The wrappers take ``approx_keys`` from
the caller (the catalog knows its key spaces; at 100 TB you would take
it from table statistics).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def shards_for_keys(approx_keys: int, floor: int = 4, keys_per_shard: int = 400) -> int:
    return max(floor, min(approx_keys // keys_per_shard, 10_000) or floor)


@contextmanager
def state_shuffle_partitions(spark: SparkSession, approx_keys: int) -> Iterator[int]:
    """Temporarily pin shuffle partitions to a key-cardinality-sized shard
    count while a streaming query is *started* (the setting is captured at
    start; restoring it afterwards does not affect the running query).

    The count only ever shrinks relative to the session's configured
    shuffle partitions: the configured value is the deployment's statement
    of available task slots (local[32] here, thousands on a real cluster),
    and more shards than slots just adds per-shard fixed cost without
    parallelism.  Sizing *down* is the win this helper exists for.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    configured = int(old) if str(old).isdigit() else 200
    n = max(4, min(shards_for_keys(approx_keys), configured))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
