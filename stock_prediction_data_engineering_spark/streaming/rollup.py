"""Continuous aggregate ("hypertable rollup"): an event-time rollup
table maintained incrementally by a stream.

The batch form of this rollup is q_tumbling_window; at ingest scale
you don't recompute it from raw events every time — you keep a rollup
table and fold each micro-batch in. Update-mode windowed aggregation
emits refreshed (window, key) rows as events arrive; the foreachBatch
upsert (streaming/upsert.py) merges them into the lake copy-on-write,
so readers always see a complete, current rollup without scanning raw
events. The watermark bounds both the agg state and which partitions
can still change — the re-written slice stays O(watermark), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .upsert import foreach_batch_upserter
from .windows import tumbling_agg, with_watermark

ROLLUP_KEYS = ["win_start", "win_end", "event_type"]


def rollup_updates(events: DataFrame, width: str = "1 hour", delay: str = "1 hour") -> DataFrame:
    """The incremental update stream: watermarked tumbling aggregates."""
    return tumbling_agg(with_watermark(events, delay), width)


def start_continuous_rollup(
    events_stream: DataFrame,
    rollup_path: str,
    width: str = "1 hour",
    delay: str = "1 hour",
    trigger: dict | None = None,
):
    """Wire the update stream into an upserted rollup table; returns
    the StreamingQuery. Update output mode re-emits a window whenever
    late rows (within the watermark) revise it; the upsert keys on the
    window+type so revisions replace, never duplicate."""
    q = (
        rollup_updates(events_stream, width, delay)
        .writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upserter(rollup_path, ROLLUP_KEYS))
    )
    q = q.trigger(**(trigger or {"availableNow": True}))
    return q.start()
