"""Event-time windowing (SURVEY.md §2.12 T1-T4).

The reference's roadmap is "daily stock data updates"
(reference README.md:10,49) — a streaming ingestion concern. Spark's
windowing expressions are identical in batch and streaming, so each
builder here takes any events-shaped DataFrame: batch for the
oracle-checked queries, ``readStream`` for the live form (smoke-tested
with the memory sink in tests/test_streaming.py).

Watermarks bound state: an aggregation over event-time windows keeps
per-window state until the watermark passes the window end, which is
what makes these plans runnable indefinitely at ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dsum


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Non-overlapping event-time windows + per-type aggregates."""
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Overlapping windows: each event contributes to width/slide
    windows; state per key is bounded by the same watermark rule."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows: per-user activity bursts separated by >= gap.
    Window extent is data-driven (merges on overlap), the canonical
    stateful-streaming operator."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound: rows older than max(ts) - delay are dropped by
    stateful operators, capping state size (T4)."""
    return events.withWatermark("ts", delay)


def stateful_dedup(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon (T5):
    state holds one entry per id seen in the last ``delay``."""
    return with_watermark(events, delay).dropDuplicates(["event_id"])
