"""Streaming as-of enrichment: annotate an event stream with the
latest reference-table row at-or-before each event's timestamp
(SURVEY.md §2.3 J8 as a streaming stage — the OHLCV domain's canonical
lookup, e.g. "the quote in effect when this trade printed").

Structured Streaming has no native as-of join (stream-stream joins are
interval-bounded equi/range joins), so this runs the batch as-of
operator inside ``foreachBatch``: each micro-batch is a bounded
DataFrame, enriched with the SAME single-shuffle union+window plan the
batch queries use (operators/asof.py — cited parity, not a second
implementation), then handed to the caller's sink function.

Correctness note: per-batch as-of against a STATIC right side is
exactly batch semantics — every event's match depends only on the
reference table, not on other events — so micro-batch boundaries
cannot change results (tested batch-vs-stream equal). A slowly-updated
reference table (dimension refresh between batches) inherits
foreachBatch's usual read-latest semantics.

Scale posture: state-free (nothing carried across batches), one keyed
shuffle per micro-batch, reference side re-read per batch — partition
pruning and pushdown apply to it like any batch scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.asof import asof_join


def start_asof_enrichment(
    events: DataFrame,
    reference: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    sink: Callable[[DataFrame, int], None],
    direction: str = "backward",
    tolerance: str | None = None,
):
    """Start a streaming query that as-of-enriches each micro-batch of
    ``events`` against ``reference`` and passes the result to ``sink``
    (a foreachBatch function). Returns the StreamingQuery."""

    def _enrich(batch: DataFrame, epoch_id: int) -> None:
        enriched = asof_join(
            batch,
            reference,
            on,
            left_ts,
            right_ts,
            right_payload,
            direction=direction,
            tolerance=tolerance,
        )
        sink(enriched, epoch_id)

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(_enrich)
        .trigger(availableNow=True)
        .start()
    )
