"""Streaming window aggregations (SURVEY.md §2B streaming rows).

The same expressions as operators.stream_batch_equiv, behind readStream
with watermarks — Structured Streaming incrementalizes the identical
logical plan, which is exactly why the batch forms are valid oracles.

Watermark choice: bounds state size (late rows beyond the bound drop);
at 100 TB/day the watermark is what keeps windowed state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (tz-aware) event time; the test
    tables carry TIMESTAMP_NTZ. With the session timezone pinned to UTC
    (session.py) the cast is value-preserving."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h tumbling count/sum (streaming twin of q_stream_tumbling)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h window sliding every 15m (streaming twin of q_stream_sliding)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_stats(events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per user (streaming twin of
    q_stream_session's gaps-and-islands batch form)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def watermark_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Replay dedup on event_id within the watermark horizon (reference
    A14 at-least-once dedup; q_stream_watermark_dedup's streaming twin).
    State = one entry per event_id until the watermark passes it."""
    return _with_event_time(events).withWatermark("ts", watermark).dropDuplicates(["event_id"])


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: purchase within [click_ts, click_ts
    + horizon] per user (q_stream_stream_join's streaming twin).

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark can size the join state buffer
    and evict rows once the watermark passes click_ts + horizon —
    without the time bound, stream-stream join state grows forever.
    """
    c = _with_event_time(clicks).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = _with_event_time(purchases).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


def enrich_static(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join (q_stream_static_join's streaming
    twin): each micro-batch joins against the static dim snapshot —
    no watermark, no join state (the static side is re-resolvable per
    batch, and Spark broadcasts it when small). The standard shape for
    decorating an event stream with slowly-changing reference data;
    pair with foreachBatch + MorTable.snapshot() when the dim itself
    is a continuously-synced table."""
    d = dim.select(
        F.col("user_id").alias("d_user_id"),
        F.col("segment"),
    )
    return stream.join(
        d, stream.user_id == d.d_user_id, "left"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
    )


def ohlc_candles(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of q_timeseries_ohlc: per (series, 1h window),
    open/high/low/close candles. min_by/max_by over the same
    struct(ts, event_id) key as the batch form — deterministic under
    any micro-batch arrival order, because the aggregate state keeps
    the (key, value) extremum, not an arrival-order artifact.
    Complete-mode output (candles update while their window is open);
    with a watermark, append mode emits each candle once, when its
    window expires."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )
