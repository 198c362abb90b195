"""Streaming sequence packing: continue `pack_assignment`'s
concat-and-chunk layout across micro-batches (SURVEY.md §2.12 T5
family; the incremental counterpart of `queries/llm_pipeline.py`).

A batch re-pack re-reads the whole corpus to learn each domain's
running token total; the stream just carries that one number forward.
State per source domain is a single cumulative token count, so an
arriving document's (pack_id, pack_offset) is assigned exactly as if
the whole history had been packed in one batch — provided documents
arrive in the intended layout order, which the ingest pipeline owns
(the same contract the batch operator documents for its order column).

Scale shape: state is one long per domain, keys partition across
executors, and each micro-batch does one Arrow-batched cumsum per
domain group — no shuffle beyond the keyed state exchange."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("cum_tokens", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tokens", LongType()),
        StructField("pack_id", LongType()),
        StructField("pack_offset", LongType()),
    ]
)


def _make_assign(capacity: int):
    def _assign(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        # a key's batch rows can arrive as SEVERAL Arrow chunks in
        # partition order, not doc_id order — concat before the sort,
        # or the cumsum would depend on the chunking (wrong at any
        # batch big enough to split)
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # within a micro-batch, layout order is doc_id order — the
            # same total order the batch operator uses
            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            tokens = pdf["n_tokens"].astype("int64")
            cum_before = tokens.cumsum().shift(fill_value=0) + cum
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": key[0],
                    "n_tokens": tokens,
                    "pack_id": (cum_before // capacity).astype("int64"),
                    "pack_offset": (cum_before % capacity).astype("int64"),
                }
            )
            cum += int(tokens.sum())
        state.update((cum,))

    return _assign


def streaming_pack_assignment(
    docs: DataFrame,
    capacity: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign (pack_id, pack_offset) to a stream of documents,
    continuing each domain's running layout across micro-batches.
    Expects columns (id_col, source_col, tokens_col); emits append-mode
    rows matching the batch `pack_assignment` output schema."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return keyed.groupBy("source").applyInPandasWithState(
        _make_assign(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
