"""Incremental upsert sink — the reference's "future daily updates"
roadmap (reference README.md:49) as a foreachBatch MERGE emulation.

Without a transactional table format (Delta/Iceberg jars are not in
this environment) the portable pattern is: per micro-batch, anti-join
the existing lake against the batch's keys, union the batch, and
rewrite the affected partitions. That is exactly what MERGE INTO
compiles to on a copy-on-write table; swapping in Delta changes this
function body, not the callers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    lake_path: str,
    keys: list[str],
) -> None:
    """Copy-on-write upsert of one (micro-)batch into a parquet lake."""
    if os.path.exists(lake_path):
        existing = spark.read.parquet(lake_path)
        keep = existing.join(batch.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    # rewrite through a staging dir (a parquet read can't overwrite its
    # own input in place), then swap at the directory level: rename-old
    # → rename-staging → delete-old. A complete copy of the data exists
    # on disk at every instant; the previous overwrite-through-the-live-
    # path truncated the lake before the new files landed, so a failure
    # mid-write left an empty lake.
    import shutil

    staging = lake_path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    old = lake_path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(lake_path):
        os.rename(lake_path, old)
    os.rename(staging, lake_path)
    shutil.rmtree(old, ignore_errors=True)


def foreach_batch_upserter(lake_path: str, keys: list[str]):
    """Adapter for stream.writeStream.foreachBatch(...)."""

    def fn(batch: DataFrame, epoch_id: int) -> None:
        upsert_batch(batch.sparkSession, batch, lake_path, keys)

    return fn
