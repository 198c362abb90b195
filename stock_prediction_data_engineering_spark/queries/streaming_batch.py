"""Event-time window aggregation, batch mode (SURVEY.md §2.12 T1).

The reference's roadmap item "daily stock data updates"
(reference README.md:10,49) maps to Structured Streaming; the same
windowing expressions run identically in batch, which is what the
DuckDB oracle can check. The streaming forms (sliding / session /
watermark / stateful dedup) live in streaming/ and are exercised as
smoke tests (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exact import dsum
from ..registry import query


@query(
    "q_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate over event time (T1). The
    window start is emitted as a formatted string so both engines hash
    the same value after µs truncation."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@query("q_sliding_window")  # rows-only: overlapping windows aren't plain SQL
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (T2) — each event lands
    in 4 windows; same expression runs under readStream."""
    from ..streaming.windows import sliding_agg

    ev = table(spark, sf_dir, "events")
    return sliding_agg(ev).select(
        F.unix_micros("win_start").alias("win_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query("q_session_window")  # rows-only: data-driven window extents
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap (T3)."""
    from ..streaming.windows import session_agg

    ev = table(spark, sf_dir, "events")
    return session_agg(ev).select(
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "user_id",
        "n_events",
        "sum_value",
    )
