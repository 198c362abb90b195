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


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP, whatever the reader
    produced. Spark's parquet reader has surfaced TIMESTAMP(NANOS) three
    different ways across versions, and downstream code (``unix_micros``,
    watermarks, window()) requires TIMESTAMP:

    - ``bigint`` — older readers under ``nanosAsLong=true``: integer
      ns→µs division (ns magnitudes ~1.7e18 exceed double's exact
      range, so never go through float), then ``timestamp_micros``.
    - ``timestamp_ntz`` — Spark 4.1+ native NANOS read (the legacy conf
      no longer takes effect): cast to TIMESTAMP. The session timezone
      is pinned UTC everywhere in this engine, so the cast is exactly
      the naive-UTC semantics the DuckDB oracles assume, and the
      reader has already truncated ns→µs the same way DuckDB does.
    - ``timestamp`` — already what we want: leave untouched.

    Every ts consumer (queries, streaming fixtures, z-order keys) must
    go through this ONE function rather than re-deriving the branch.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


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
        # events.ts is TIMESTAMP(NANOS) parquet. Older Spark readers
        # reject it unless nanosAsLong=true (then it reads as bigint);
        # Spark 4.1+ reads it natively as TIMESTAMP_NTZ and ignores the
        # conf. Set the conf defensively for old readers, then let
        # normalize_ts() handle whichever dtype actually arrived.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # locked-down session: proceed and hope it was preset
        return normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_entry(
    spark: SparkSession, text: str, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """Run a SQL-text query against the testdata tables: every table
    is (re)registered as a temp view, then ``text`` goes through
    ``spark.sql``. This is the whole SQL front-end — the engine's
    operators are Catalyst plans, so any query expressible over the
    DataFrame API here is equally expressible as SQL text, sharing
    the same optimizer, the same pushdown, and the same physical
    strategies (tests/test_sql_text.py pins DataFrame/SQL-text
    equality on representative declared queries)."""
    register_views(spark, sf_dir)
    return spark.sql(text)
