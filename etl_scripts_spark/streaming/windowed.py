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


def _events_stream(spark: SparkSession, events_parquet: str) -> DataFrame:
    """Shared file-source plumbing for every wrapper here: nanos conf,
    schema from the batch reader, sibling glob (the file-stream source
    wants a directory or glob, not a bare file path), normalized ts.
    ONE copy — a fix to the glob derivation or the conf handling must
    not be re-applied per wrapper."""
    from ..catalog import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_parquet).schema
    glob_path = events_parquet.rsplit(".", 1)[0] + ".*"
    return normalize_events(spark.readStream.schema(schema).parquet(glob_path))


def _drain(
    spark: SparkSession, out: DataFrame, approx_keys: int, mode: str = "complete"
) -> DataFrame:
    """Shared AvailableNow → memory-sink drain with the state shard
    count sized to the key cardinality (see :mod:`.tuning`) — native
    stateful operators, so the µs-per-key NATIVE law applies."""
    from .tuning import NATIVE_STATE_KEYS_PER_SHARD, state_shuffle_partitions

    name = f"etl_stream_out_{next(_name_counter)}"
    with state_shuffle_partitions(
        spark, approx_keys, keys_per_shard=NATIVE_STATE_KEYS_PER_SHARD
    ):
        query = (
            out.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name)


def session_windows_available_now(
    spark: SparkSession,
    events_parquet: str,
    gap_minutes: int = 30,
    approx_keys: int = 100_000,
) -> DataFrame:
    """Streaming gap-based sessionization via the native session_window
    operator (merging keyed session state, watermark-driven eviction),
    drained with Trigger.AvailableNow.

    Returns (user_id, session_start, n_events, span_us).  span is computed
    in microseconds from the window bounds (end = last event + gap, so
    span = end - start - gap) — full precision, no truncate-then-diff
    mismatch with the oracle.  Complete output mode (session windows
    support append/complete only): one AvailableNow drain emits every
    session's final state, which the batch gap-sessionization oracle
    verifies.  A production continuous run would use append mode, where
    the watermark finalizes (and evicts) closed sessions incrementally.
    """
    stream = _events_stream(spark, events_parquet)
    gap = f"{gap_minutes} minutes"
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    gap_us = gap_minutes * 60 * 1_000_000
    return _drain(spark, agg, approx_keys).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        "n_events",
        (
            F.unix_micros(F.col("session_window.end"))
            - F.unix_micros(F.col("session_window.start"))
            - F.lit(gap_us)
        ).alias("span_us"),
    )


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
    stream = _events_stream(spark, events_parquet)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    return _drain(spark, agg, approx_keys).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH").alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def enriched_counts_available_now(
    spark: SparkSession,
    events_parquet: str,
    dim: DataFrame,
    dim_key: str,
    group_col: str,
    approx_keys: int = 256,
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup — THE standard
    streaming-dimension pattern: the event stream joins a static (slowly-
    changing) dimension, then aggregates per (dimension attribute × hour).

    Scale shape: the static side broadcasts (re-resolved per micro-batch,
    so a dim refresh between batches is picked up); the stream side never
    shuffles until the windowed aggregate, whose state is keyed by
    (attribute × hour) — a tiny keyspace, so shards are sized to it, not
    to event volume.  Events missing from the dimension are kept
    (left join, attribute NULL→'UNKNOWN') — dropping them would silently
    under-count, the streaming analogue of the keep-flowing contract.
    """
    stream = _events_stream(spark, events_parquet)
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim[dim_key], "left"
    ).withColumn("_grp", F.coalesce(F.col(group_col), F.lit("UNKNOWN")))
    agg = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("_grp"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    return _drain(spark, agg, approx_keys).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH").alias("hour_start"),
        F.col("_grp").alias("group_key"),
        "n_events",
        "sum_value",
    )


def interval_join_available_now(
    spark: SparkSession,
    events_parquet: str,
    left_type: str = "purchase",
    right_type: str = "click",
    window_hours: int = 6,
    approx_keys: int = 1000,
) -> DataFrame:
    """STREAM-STREAM interval join: each left-type event joins the same
    user's right-type events from the preceding `window_hours` — the
    attribution-window pattern (purchase ← clicks that led to it).

    Both sides are genuine streams (two file-source readers over the same
    path), so Spark buffers each side in join state and the time-range
    condition plus watermarks bound that state: right-side rows older
    than the window beyond the watermark are evicted, left rows evict at
    the watermark itself.  Without the time bound the state would grow
    unboundedly — the condition IS the scale story.  Inner interval joins
    support append mode, which a single AvailableNow drain flushes
    completely, so the result equals the batch interval join the oracle
    runs.

    Returns (left_id, right_id, lag_s): lag in whole seconds (micros
    diff // 1e6, exact integer arithmetic in both engines).
    """
    def _stream():
        return _events_stream(spark, events_parquet)

    left = (
        _stream()
        .filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "1 hour")
    )
    right = (
        _stream()
        .filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", f"{window_hours + 1} hours")
    )
    joined = left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL {window_hours} HOURS AND l_ts"
        ),
        "inner",
    )
    out = joined.select(
        "left_id",
        "right_id",
        (
            (F.unix_micros(F.col("l_ts")) - F.unix_micros(F.col("r_ts")))
            / F.lit(1_000_000)
        ).cast("bigint").alias("lag_s"),
    )
    # join state is keyed by user — shard count sized to key cardinality
    # (each extra shard is 4 state stores here: left/right × keyed/KV)
    return _drain(spark, out, approx_keys, mode="append")


def hopping_counts_available_now(
    spark: SparkSession,
    events_parquet: str,
    width_s: int = 3600,
    slide_s: int = 900,
    approx_keys: int = 4000,
) -> DataFrame:
    """Streaming HOPPING-window rollup drained to a batch result — the
    streaming twin of operators.windows.hopping_rollup, completing the
    batch/streaming symmetry the tumbling rollup already has: the same
    native `window(ts, width, slide)` multi-assign runs incrementally
    (state keyed by overlapping-window × event_type; an event updates
    width/slide window states as it arrives), and an AvailableNow drain
    over the same files equals the batch operator row-for-row — the
    verification law every streaming op here follows.  The same shared
    floor(v·100 + 0.5) exact cents law, the same epoch-µs bounds.
    """
    if width_s <= 0 or slide_s <= 0 or width_s % slide_s != 0:
        raise ValueError("width_s must be a positive multiple of slide_s")
    stream = _events_stream(spark, events_parquet)
    agg = (
        stream.withWatermark("ts", f"{width_s} seconds")
        .groupBy(
            F.window("ts", f"{width_s} seconds", f"{slide_s} seconds"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("value_cents"),
        )
    )
    return _drain(spark, agg, approx_keys).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        F.unix_micros(F.col("window.end")).alias("window_end_us"),
        "event_type",
        "n_events",
        "value_cents",
    )
