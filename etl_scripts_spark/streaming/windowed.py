"""Structured Streaming wrappers — the reference's dropbox trigger semantics.

The reference's operational loop (file arrival + marker-file completeness
gate → process once — SURVEY §2.8) maps to a file-source stream with
`Trigger.AvailableNow`: process everything currently available, exactly once,
then stop.  The same aggregation expressions as the batch operators in
:mod:`..operators.windows` are reused so batch and streaming agree.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_name_counter = itertools.count()


def hourly_counts_available_now(
    spark: SparkSession, events_parquet: str, approx_keys: int = 4000
) -> DataFrame:
    """Streaming tumbling-hour rollup over a parquet path, drained to a batch
    result via Trigger.AvailableNow + memory sink.

    Uses `window(ts, '1 hour')` — the streaming-native tumbling window whose
    start equals `date_trunc('hour', ts)`, so the batch oracle matches.
    Aggregation state is keyed by (hour-window × event_type) — a few
    thousand keys — so the state shard count is sized to that cardinality,
    not to the event volume (see :mod:`.tuning`).
    """
    from ..catalog import normalize_events
    from .tuning import state_shuffle_partitions

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_parquet).schema
    # The file-stream source wants a directory or glob, not a bare file path.
    glob_path = events_parquet.rsplit(".", 1)[0] + ".*"
    stream = normalize_events(spark.readStream.schema(schema).parquet(glob_path))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    name = f"etl_stream_out_{next(_name_counter)}"
    with state_shuffle_partitions(spark, approx_keys):
        query = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH").alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )
