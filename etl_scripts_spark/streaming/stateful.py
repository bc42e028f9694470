"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming engine, but its per-entity bookkeeping
(RETRY_COUNT persistent map, register-fastq-dropbox.py:48-56; session-scoped
used-identifier sets, register-nanopore.py:62-65) is exactly keyed mutable
state over an event stream.  Re-expressed Spark-first: the state lives in the
state store (checkpointed, partitioned by key, survives restarts), updates
are Arrow-batched per group, and `Trigger.AvailableNow` drains whatever is
on disk exactly once — the dropbox semantics.

At 100 TB the state store shards with the shuffle partitioning of the group
key; no driver-side maps, no collect.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_name_counter = itertools.count()

USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _user_totals_fn(
    key: Tuple[Any, ...], pdfs: Iterator, state: GroupState
) -> Iterator:
    """Accumulate (count, value-cents) per user in keyed state.

    Cents via floor(v*100 + 0.5) — identical float semantics in numpy and
    any SQL oracle, unlike round() whose tie-breaking differs per engine.
    """
    import numpy as np
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]})


def stateful_user_totals_available_now(
    spark: SparkSession, events_parquet: str, approx_keys: int = 1500
) -> DataFrame:
    """Per-user running totals as a custom stateful operator, drained to a
    batch result.  With a single AvailableNow micro-batch the final state
    equals the batch groupBy — which is what the oracle checks.

    State-store shard count is sized to the user-id cardinality (see
    :mod:`.tuning`) — the catalog's events table has ~1.5 k distinct users
    per sf; at production key counts pass the table-statistics estimate.
    """
    from ..catalog import normalize_events
    from .tuning import state_shuffle_partitions

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_parquet).schema
    glob_path = events_parquet.rsplit(".", 1)[0] + ".*"
    stream = normalize_events(spark.readStream.schema(schema).parquet(glob_path))
    totals = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_totals_fn,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"etl_stateful_out_{next(_name_counter)}"
    with state_shuffle_partitions(spark, approx_keys):
        query = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    # update mode may emit a row per micro-batch per key; keep the last.
    out = spark.table(name)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max_by("sum_cents", "n_events").alias("sum_cents")
    )
