"""Streaming window operators: tumbling/sliding/session aggregations with
watermarks, stateful dedup (SURVEY.md §2.12 streaming row; §7.2 M7).

Each builder takes a *streaming* DataFrame and returns the transformed
streaming DataFrame — identical operators to the batch forms in
operators/events.py, which act as their exactness oracles.

Watermark policy: event-time watermark bounds state; in complete-mode
aggregations it is advisory (state still bounded by window count), in
append-mode dedup it defines how long a key is remembered. The declared
queries use a watermark longer than the corpus span so streaming results
are exactly the batch results (late data is exercised separately in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import dsum, fmt_ts


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window x event_type: count + exact value sum."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_totals(
    stream: DataFrame,
    window: str = "24 hours",
    slide: str = "12 hours",
    watermark: str = "48 hours",
) -> DataFrame:
    """Sliding window totals — each event contributes to window/slide panes."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_aggregate(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-merged) — Spark's native stateful
    session operator; sessions close when the watermark passes start+gap."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("w.start")).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def dedup_keys_within_watermark(
    stream: DataFrame, keys: list[str], watermark: str
) -> DataFrame:
    """Stateful streaming dedup: emit each key combination once; state for a
    key is dropped once the watermark passes it (bounded memory at 100 TB —
    the whole point vs a global distinct)."""
    return (
        stream.withWatermark("ts", watermark)
        .select("ts", *keys)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
