"""Streaming quantile monitor: per-key running p50/p90/p99 brackets
maintained across micro-batches with ``applyInPandasWithState`` — the
streaming twin of ``q_quantile_sketch`` (queries/stats.py), and the
payoff of choosing the sqrt-histogram there: the state is a sparse
bucket->count map, merging a new batch is integer addition, so stream
emissions are EXACTLY the sketch a batch pass would build over the
union of all batches — no decay, no approximation drift across
restarts.

State: the sparse histogram is carried as a compact string
("bucket:count;..."), the same portable-state choice as
streaming/moments.py (exact at any size, no dependency on map-typed
state-store support). Bucket = floor(sqrt(cents)) computed with IEEE
sqrt — identical to the batch query's expression for every cent value
below 2^52, so the streaming histogram is bit-identical to the batch
one (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PCTS = (50, 90, 99)

STATE_SCHEMA = StructType([StructField("hist", StringType())])

OUTPUT_SCHEMA = StructType(
    [StructField("event_type", StringType()), StructField("n", LongType())]
    + [
        StructField(f"p{p}_{side}", LongType())
        for p in PCTS
        for side in ("lo", "hi")
    ]
)


def _decode(s: str) -> dict[int, int]:
    if not s:
        return {}
    return {
        int(b): int(c)
        for b, c in (pair.split(":") for pair in s.split(";"))
    }


def _encode(h: dict[int, int]) -> str:
    return ";".join(f"{b}:{c}" for b, c in sorted(h.items()))


def quantile_brackets(h: dict[int, int]) -> tuple[int, list[int]]:
    """(n, [lo, hi] per percentile): smallest bucket whose running
    mass reaches p% — the identical cross-multiplied rule as the
    batch query's `cum*100 >= n*pct` join."""
    n = sum(h.values())
    out: list[int] = []
    cum = 0
    targets = iter(PCTS)
    want = next(targets)
    for b in sorted(h):
        cum += h[b]
        while cum * 100 >= n * want:
            out.extend((b * b, (b + 1) * (b + 1) - 1))
            nxt = next(targets, None)
            if nxt is None:
                return n, out
            want = nxt
    return n, out  # unreachable for non-empty h (p<=100)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    h = _decode(state.get[0]) if state.exists else {}
    for pdf in batches:
        for v in pdf["value"]:
            # exact cents (<=2-decimal doubles), same recovery as the
            # batch DECIMAL cast; floor(IEEE sqrt) == the batch bucket
            b = math.floor(math.sqrt(round(v * 100)))
            h[b] = h.get(b, 0) + 1
    state.update((_encode(h),))
    n, brackets = quantile_brackets(h)
    row = {"event_type": [key[0]], "n": [n]}
    for (p, side), val in zip(
        [(p, s) for p in PCTS for s in ("lo", "hi")], brackets
    ):
        row[f"p{p}_{side}"] = [val]
    yield pd.DataFrame(row)


def streaming_quantiles(events: DataFrame) -> DataFrame:
    """Running quantile brackets per event_type over a stream of
    (event_type, value) rows: one summary row per key per micro-batch,
    always equal to the sketch over everything seen so far. Histogram
    addition is order-free, so no watermark or replay staging is
    needed. Precondition: values are non-negative (sqrt bucketing
    domain — the monitored metrics are prices/latencies/counts)."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
