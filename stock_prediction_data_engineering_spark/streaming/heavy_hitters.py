"""Streaming heavy-hitter maintenance: a sharded space-saving sketch
via ``applyInPandasWithState`` (SURVEY.md §2.12 T5 family; the
streaming complement of the batch `q_heavy_keys` skew profile).

Why a sketch: the batch profile re-scans history every run; a stream
needs the current top keys *now*, with bounded state. Space-saving
(Metwally et al., the top-k summary used by most production stream
processors) keeps at most ``capacity`` (key, count, err) entries and
guarantees (a) every estimate over-counts by at most its recorded
``err`` ≤ N/capacity, and (b) any key whose true count exceeds
N/capacity is present in the summary.

Distribution: keys are hash-sharded; each shard maintains an
independent sketch over ITS key subset (disjoint key spaces — sketch
merging across shards is never needed, so no accuracy loss at the
merge step and no single-partition state bottleneck). Total state is
``n_shards × capacity`` rows, independent of stream length. Rows
reach each shard's update as Arrow-batched pandas; the per-batch
pre-aggregation (value_counts) means sketch work is per *distinct*
key per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("key", LongType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
    ]
)


def _spacesaving_merge(
    sketch: dict[int, tuple[int, int]], batch_counts: pd.Series, capacity: int
) -> None:
    """Fold a batch's exact per-key counts into the sketch in place.

    Keys are processed in sorted order so the eviction sequence — and
    therefore the emitted summary — is deterministic for a given
    micro-batch split."""
    for key, delta in sorted(batch_counts.items()):
        key = int(key)
        delta = int(delta)
        if key in sketch:
            cnt, err = sketch[key]
            sketch[key] = (cnt + delta, err)
        elif len(sketch) < capacity:
            sketch[key] = (delta, 0)
        else:
            # evict the min-count entry (ties: smallest key, for
            # determinism); the newcomer inherits its count as error
            evict_key = min(sketch, key=lambda k: (sketch[k][0], k))
            floor_cnt = sketch[evict_key][0]
            del sketch[evict_key]
            sketch[key] = (floor_cnt + delta, floor_cnt)


def _make_update(capacity: int):
    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, errs = state.get
            sketch = {
                int(k): (int(c), int(e)) for k, c, e in zip(keys, counts, errs)
            }
        else:
            sketch = {}
        for pdf in batches:
            if len(pdf):
                _spacesaving_merge(sketch, pdf["k"].value_counts(), capacity)
        items = sorted(sketch.items())
        state.update(
            (
                [k for k, _ in items],
                [c for _, (c, _) in items],
                [e for _, (_, e) in items],
            )
        )
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(items),
                "key": [k for k, _ in items],
                "est_count": [c for _, (c, _) in items],
                "max_err": [e for _, (_, e) in items],
            }
        )

    return _update


def _shard_of(key: Column, n_shards: int) -> Column:
    # non-negative hash shard; pmod keeps negative hashes in range
    return F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int")


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Maintain per-shard space-saving summaries over a (possibly
    streaming) DataFrame. Emits every shard's refreshed summary each
    micro-batch (``update`` mode); the global top-k at any moment is
    the top-k of the union of shard summaries, with per-key error
    bounded by that shard's N/capacity."""
    keyed = events.select(
        _shard_of(F.col(key_col), n_shards).alias("shard"),
        F.col(key_col).cast("long").alias("k"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_update(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
