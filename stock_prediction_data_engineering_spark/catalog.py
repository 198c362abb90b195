"""Testdata catalog: parquet tables under a scale-factor directory.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings. Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and row-group skipping for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are fixed-size; supplier/part grow slowly).
BROADCAST_DIMS = ("region", "nation")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is nanosecond-precision parquet, surfaced as a long
        # (session.py sets nanosAsLong). Truncate to µs TimestampType —
        # integer division, since ~1.7e18 ns exceeds double's exact
        # range. DuckDB truncates ns->µs the same way, so values hash
        # identically.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
