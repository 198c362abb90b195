"""Streaming distribution-drift monitor: per-key running moment
statistics (mean / skewness / excess kurtosis) maintained across
micro-batches with ``applyInPandasWithState`` — the streaming twin of
``q_moment_stats`` (queries/stats.py), and the payoff of choosing the
RAW POWER-SUM form there: the state is just (n, Σc, Σc², Σc³, Σc⁴)
and merging a new batch is integer addition, so stream emissions are
EXACTLY what the batch query computes over the union of all batches —
no approximation, no windowing compromise.

State exactness: Σc⁴ overflows int64 (one 10⁵-cent value is 10²⁰), so
the sums are carried as decimal strings and accumulated in Python
arbitrary-precision ints — tiny (5 short strings per key), exact at
any corpus size, and portable through the state-store schema without
depending on decimal state support. The final statistics convert the
exact sums to IEEE doubles with the same expression order as the
batch query, so floor-scaled outputs agree bit-for-bit (asserted in
tests/test_streaming.py).
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

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1", StringType()),
        StructField("s2", StringType()),
        StructField("s3", StringType()),
        StructField("s4", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("mean_x100", LongType()),
        StructField("skew_ppm", LongType()),
        StructField("kurt_ppm", LongType()),
    ]
)


def _stats_from_sums(
    n: int, s1: int, s2: int, s3: int, s4: int
) -> tuple[int | None, int | None, int | None]:
    """(mean_x100, skew_ppm, kurt_ppm) from exact power sums — the
    same expression structure as q_moment_stats' double algebra, so
    floor-scaled results match the batch query exactly. None where
    undefined (n < 3 or zero variance)."""
    if n < 3:
        return None, None, None
    nd = float(n)
    m = float(s1) / nd
    r2 = float(s2) / nd
    r3 = float(s3) / nd
    r4 = float(s4) / nd
    var = r2 - m * m
    if var <= 0:
        return math.floor(float(s1) / nd * 100), None, None
    m3 = r3 - 3 * m * r2 + 2 * m * m * m
    m4 = r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
    return (
        math.floor(float(s1) / nd * 100),
        math.floor(m3 / (var * math.sqrt(var)) * 1000000),
        math.floor((m4 / (var * var) - 3) * 1000000),
    )


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s1, s2, s3, s4 = (
        (state.get[0], *(int(s) for s in state.get[1:]))
        if state.exists
        else (0, 0, 0, 0, 0)
    )
    for pdf in batches:
        # exact cents: values carry <=2 decimals, so round() recovers
        # the integer cents the batch query's DECIMAL cast produces
        for v in pdf["value"]:
            c = round(v * 100)
            n += 1
            s1 += c
            c2 = c * c
            s2 += c2
            s3 += c2 * c
            s4 += c2 * c2
    state.update((n, str(s1), str(s2), str(s3), str(s4)))
    mean_x100, skew_ppm, kurt_ppm = _stats_from_sums(n, s1, s2, s3, s4)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "mean_x100": [mean_x100],
            "skew_ppm": [skew_ppm],
            "kurt_ppm": [kurt_ppm],
        }
    )


def streaming_moments(events: DataFrame) -> DataFrame:
    """Running (mean, skew, kurtosis) per event_type over a stream of
    (event_type, value) rows: one summary row per key per micro-batch,
    always equal to the batch statistics over everything seen so far.
    Arrival order is irrelevant — power sums are order-free — so no
    watermark or replay staging is needed, unlike the EMA recurrence
    (streaming/indicators.py)."""
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
