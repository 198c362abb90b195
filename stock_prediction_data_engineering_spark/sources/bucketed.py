"""Bucketed tables — shuffle-free co-located joins (100 TB posture).

The reference co-locates data only by directory partitioning
(company=…/year=…, reference dags/stock_data_airflow_local_aws_s3.py:53-57),
which prunes scans but does nothing for joins. Spark's table bucketing
hash-partitions rows into a fixed number of buckets *at write time*;
two tables bucketed by the same key into the same bucket count join
with **zero shuffle exchanges** — at fact-⨝-fact scale that shuffle is
the single largest cost in the plan, and bucketing pays it once at
ingest instead of per query.

Bucketing metadata lives in the session catalog (``saveAsTable``), so
readers must go through ``spark.table`` — a raw ``spark.read.parquet``
of the same files would not know the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``bucket_cols``. Sorting within buckets additionally
    removes the Sort under a sort-merge join."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — preserves the bucket spec for exchange elision."""
    return spark.table(table_name)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a sort-merge join whose children read
    pre-hashed files directly: no Exchange on either side."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
