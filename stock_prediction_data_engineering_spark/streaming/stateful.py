"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.12 T5 — the "arbitrary per-key state" generalization).

The reference's roadmap is incremental daily updates
(reference README.md:10,49); its only per-key computation is the
history-length probe behind ``History_Existing``
(company_tick_symbols_processed.csv, SURVEY.md §2.9). This module is
that probe as a *streaming* operator: per key, an exact running
aggregate (count / sum / min / max) maintained across micro-batches in
Spark-managed state, emitting the refreshed totals every batch.

Scale posture: state is one small tuple per key, partitioned by the
grouping key across executors; the watermark/timeout bounds lifetime.
Arrow moves each group's rows as pandas — no row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("lo", DoubleType()),
        StructField("hi", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one key into the running aggregate."""
    if state.exists:
        n, total, lo, hi = state.get
    else:
        n, total, lo, hi = 0, 0.0, float("inf"), float("-inf")
    for pdf in batches:
        v = pdf["value"]
        n += len(v)
        total += float(v.sum())
        if len(v):
            lo = min(lo, float(v.min()))
            hi = max(hi, float(v.max()))
    state.update((n, total, lo, hi))
    yield pd.DataFrame(
        {
            "key": [str(key[0])],
            "n_events": [n],
            "sum_value": [total],
            "min_value": [lo],
            "max_value": [hi],
        }
    )


def running_stats(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key exact running stats over a stream of (key, value) rows.

    Works on a streaming DataFrame (state lives in the state store,
    one update per micro-batch) and, degenerately, on a single batch.
    """
    return (
        events.selectExpr(f"{key_col} AS key", "CAST(value AS DOUBLE) AS value")
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
