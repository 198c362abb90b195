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
    try:
        # oracle parity is defined under naive-UTC timestamp semantics
        # (SURVEY.md §5.4); pin it even on caller-provided sessions
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects outright. session.py sets nanosAsLong at build time,
        # but this must also work on a caller-provided session (the
        # correctness driver builds its own) — the conf is runtime-
        # settable, so set it defensively before the read.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # locked-down session: proceed and hope it was preset
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # truncate ns -> µs TimestampType via integer division
            # (~1.7e18 ns exceeds double's exact range). DuckDB
            # truncates ns->µs the same way, so values hash identically.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
