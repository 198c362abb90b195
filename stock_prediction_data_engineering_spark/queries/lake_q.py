"""Lake write-path queries (SURVEY.md §2.1 S3/S4): the reference's
partitioned-parquet sink exercised end-to-end — write then read back
through partition discovery. Rows-only (the oracle can't observe a
filesystem side effect)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.lake import ohlcv_from_events, read_lake, write_lake

# scratch space inside the repo (testdata and everything else outside
# /root/repo is read-only for this engine)
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")


@query("q_partitioned_write_readback")  # rows-only: filesystem side effect
def q_partitioned_write_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write OHLCV-shaped bars as a company=/year= snappy lake
    (reference layout, dags/...aws_s3.py:53-63), read it back via
    partition discovery, and return per-partition file-grain counts —
    the reference's output inventory (~1 file per company-year)."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(tempfile.mkdtemp(dir=SCRATCH, prefix="lake_"), "ohlcv")
    bars = ohlcv_from_events(spark, sf_dir)
    write_lake(bars, path)
    back = read_lake(spark, path)
    # predicate on partition columns -> pruned scan (asserted in tests)
    return (
        back.filter(F.col("year") >= 2024)
        .groupBy("company", "year")
        .agg(F.count("*").alias("n_bars"), F.sum("volume").alias("total_volume"))
    )
