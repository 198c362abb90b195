"""Streaming joins (SURVEY.md §2.12 extension): watermarked
stream-stream interval joins and stream-static dimension enrichment.

The reference's roadmap is continuous daily updates (reference
README.md:10,49); once bars arrive as a stream, the natural queries
join them — against a slowly-changing dimension (symbol metadata) or
against another stream (e.g. corporate-action events within a time
window of the bar).

State discipline (the 100 TB concern): a stream-stream join's state
grows unboundedly unless BOTH sides carry watermarks AND the join
condition bounds event time on both sides. ``interval_join`` enforces
that shape — equality keys plus a two-sided time-range predicate — so
Spark can expire state past ``watermark + interval``. Stream-static
joins keep no state at all (the static side is just a lookup,
broadcast when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    interval: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: rows pair when keys match and
    ``right_ts`` falls in ``[left_ts - interval, left_ts]``.

    Both inputs must be streaming DataFrames with distinct column
    names for their event-time columns. Watermarks + the two-sided
    range predicate make join state finite: each side's buffered rows
    expire once the other side's watermark passes their admissible
    window (Spark's state-cleanup requirement for stream-stream
    joins).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"{key}_r"] if f"{key}_r" in rw.columns else lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {interval}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    joined = lw.join(rw, cond, how)
    return joined


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, on: list[str] | str, broadcast: bool = True
) -> DataFrame:
    """Stream-static join: enrich a stream with a dimension table.
    Stateless — each micro-batch joins against the (re-read) static
    relation; ``broadcast=True`` pins the hash-lookup plan for small
    dims."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, "left")
