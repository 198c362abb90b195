"""Hive-partitioned Parquet lake — the reference's storage layout,
Spark-native.

The reference writes one snappy parquet file per (company, year) under
``company={symbol}/year={year}/`` directories by hand (reference
dags/stock_data_airflow_local_aws_s3.py:53-63) and walks the tree to
upload to S3 (:74-91). In Spark the identical ``k=v`` layout is one
``partitionBy`` write; reads get partition discovery + pruning for
free, and an object store is just a different path scheme
(``s3a://…``) with the committer replacing walk-and-put.

Differences from the reference, by design (SURVEY.md §1.2):

- the partition key columns are NOT duplicated inside the data files
  (the reference writes ``Year`` both in-file and in the directory,
  which collides under Spark's case-insensitive resolution);
- "batch_{n}" work-unit directories are dropped — task partitioning
  replaces them; batch ids remain reproducible as data
  (q_batch_assign);
- small-file control: ``files_per_partition`` repartitions before the
  write, because one file per (company, year) at reference scale is
  ~26.5k tiny files — fine for compat, wrong for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PARTITION_COLS = ("company", "year")


def write_lake(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = DEFAULT_PARTITION_COLS,
    compression: str = "snappy",
    mode: str = "overwrite",
    files_per_partition: int | None = 1,
) -> None:
    """Write ``df`` as a Hive-partitioned snappy-parquet lake.

    ``files_per_partition=1`` reproduces the reference's one-file-per-
    (company, year) grain; pass ``None`` to let upstream partitioning
    decide (the 100 TB default).
    """
    if files_per_partition is not None:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .option("compression", compression)
        .parquet(path)
    )


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read the lake back; partition columns come from the directory
    scheme and predicates on them prune at planning time."""
    return spark.read.parquet(path)


def ohlcv_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an OHLCV-bar-shaped table from the events stream so lake
    tests exercise the reference's exact layout without network
    fetches: company <- user_id (mod 100 symbols), trading day <-
    date(ts), open/high/low/close <- value aggregates, volume <- count.
    """
    from ..catalog import table

    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    sym = F.concat(F.lit("SYM"), F.lpad((F.col("user_id") % 100).cast("string"), 3, "0"))
    return (
        ev.select(
            sym.alias("company"),
            F.col("ts"),
            day.alias("bar_date"),
            F.col("value"),
        )
        .groupBy("company", "bar_date")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").cast("long").alias("volume"),
        )
        .withColumn("year", F.year("bar_date"))
    )
