"""Streaming finance-indicator maintenance (SURVEY.md §2.12 T5 +
§2.13 R19): the EMA/MACD recurrence of ``operators/ewm.py`` kept live
across micro-batches with ``applyInPandasWithState`` — the streaming
form of the reference's "daily stock data updates" roadmap
(reference README.md:10,49) applied to its indicated analysis stage.

Exactness: an adjust=False EMA continued from a checkpointed previous
value y_prev over new points x1.. is the SAME float sequence the batch
recurrence produces — seed the pandas kernel by prepending y_prev and
dropping the first output. So stream emissions are bit-identical to
re-running the batch operator over the full history (asserted in
tests/test_streaming.py), with O(3 doubles) state per key.

Ordering: like every recurrence, correctness needs per-key
time-ordered arrival across micro-batches (within a batch we sort).
Out-of-order feeds need an upstream watermark + sorted replay stage;
the operator itself is deliberately order-faithful.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ema_fast", DoubleType()),
        StructField("ema_slow", DoubleType()),
        StructField("macd_signal", DoubleType()),
    ]
)

# ts is deliberately NOT round-tripped through the state operator: the
# Arrow serializer for applyInPandasWithState re-scales tz-aware
# timestamps inconsistently (µs values resurface as ns); event_id
# identifies the row and consumers re-join ts when they need it.
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ema_fast", DoubleType()),
        StructField("ema_slow", DoubleType()),
        StructField("macd", DoubleType()),
        StructField("macd_signal", DoubleType()),
        StructField("macd_hist", DoubleType()),
    ]
)


def _continued_ewm(x: pd.Series, span: int, prev: float | None) -> pd.Series:
    """adjust=False EMA of x, continued from prev (None = fresh seed).
    Prepending prev reproduces the recurrence y = (1-a)·y_prev + a·x
    exactly, so chunked evaluation equals one-shot evaluation."""
    if prev is None:
        return x.ewm(span=span, adjust=False).mean()
    seeded = pd.concat([pd.Series([prev]), x], ignore_index=True)
    return seeded.ewm(span=span, adjust=False).mean().iloc[1:].reset_index(drop=True)


def _make_update(fast: int, slow: int, signal: int):
    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        pf, ps, psig = state.get if state.exists else (None, None, None)
        f = _continued_ewm(pdf["value"], fast, pf)
        s = _continued_ewm(pdf["value"], slow, ps)
        m = f - s
        sig = _continued_ewm(m, signal, psig)
        state.update((float(f.iloc[-1]), float(s.iloc[-1]), float(sig.iloc[-1])))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ema_fast": f,
                "ema_slow": s,
                "macd": m,
                "macd_signal": sig,
                "macd_hist": m - sig,
            }
        )

    return update


def streaming_macd(
    events: DataFrame, fast: int = 12, slow: int = 26, signal: int = 9
) -> DataFrame:
    """Per-key MACD stack over a stream of (user_id, event_id, ts,
    value) rows: every input row emits one indicator row, with the
    recurrence state carried in the state store between micro-batches.
    Works degenerately on a single batch too."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(fast, slow, signal),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
