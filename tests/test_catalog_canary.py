"""Environment-drift canary for the catalog's timestamp boundary.

The testdata writes ``events.ts`` as parquet TIMESTAMP(NANOS), and
Spark's reader has surfaced that type three different ways across
versions — this canary guards all three so a Spark upgrade fails ONE
named test instead of 20 downstream symptoms (round 2 lost 7 queries,
8 streaming tests and the bench run to exactly this drift):

1. old readers reject NANOS outright unless
   ``spark.sql.legacy.parquet.nanosAsLong=true`` → ``bigint`` column;
2. Spark 4.1+ reads NANOS natively as ``timestamp_ntz`` and silently
   ignores the legacy conf;
3. a future reader may land it as plain ``timestamp`` directly.

Whatever arrives, ``catalog.table()`` must hand every consumer a plain
TIMESTAMP ``ts`` (``unix_micros``, watermarks and ``window()`` all
reject NTZ), with values equal to the naive-UTC µs-truncated nanos
that the DuckDB oracles compute.
"""

from __future__ import annotations

import datetime

from conftest import SF_SMOKE


def test_events_ts_lands_as_timestamp(spark):
    from stock_prediction_data_engineering_spark.catalog import table

    df = table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        "catalog.table('events') must normalize ts to TIMESTAMP; got "
        f"{dict(df.dtypes)['ts']} — the parquet reader's NANOS behavior "
        "has drifted again (see module docstring for the three forms)"
    )
    # unix_micros is the canonical downstream consumer that rejects NTZ
    from pyspark.sql import functions as F

    n = df.select(F.unix_micros("ts").alias("us")).filter("us IS NOT NULL").count()
    assert n == df.count() > 0


def test_events_ts_values_match_duckdb_oracle(spark, duck):
    """Value-level drift guard: min/max/count-distinct of ts must equal
    DuckDB's read of the same file (both truncate ns → µs, naive UTC)."""
    from conftest import SF_ORACLE
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.catalog import table

    df = table(spark, SF_ORACLE, "events")
    got = df.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.count_distinct("ts").alias("n"),
    ).first()
    lo, hi, n = duck.sql(
        "SELECT min(ts), max(ts), count(DISTINCT ts) FROM events"
    ).fetchall()[0]

    def naive(t: datetime.datetime) -> datetime.datetime:
        return t.replace(tzinfo=None)

    assert naive(got["lo"]) == naive(lo)
    assert naive(got["hi"]) == naive(hi)
    assert got["n"] == n


def test_normalize_ts_handles_all_three_reader_forms(spark):
    """normalize_ts must be a no-op on TIMESTAMP, a cast on NTZ, and an
    integer ns→µs conversion on bigint — all landing on TIMESTAMP with
    identical values."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.catalog import normalize_ts

    base_us = 1_700_000_000_123_456  # µs with sub-millisecond precision
    as_ts = spark.range(1).select(
        F.timestamp_micros(F.lit(base_us)).alias("ts")
    )
    as_ntz = as_ts.select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    as_ns_long = spark.range(1).select(
        (F.lit(base_us) * 1000 + 789).alias("ts")  # extra ns truncate away
    )
    want = datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    for df in (as_ts, as_ntz, as_ns_long):
        out = normalize_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp", df.dtypes
        assert out.first()["ts"].replace(tzinfo=None) == want


def test_catalog_schema_canary_all_tables(spark):
    """Broad reader-drift guard: the column dtypes every query relies
    on, asserted per table in one place — a Spark/parquet upgrade that
    re-types anything fails here by name instead of as scattered
    query crashes (the round-2 failure mode, generalized past ts)."""
    from stock_prediction_data_engineering_spark.catalog import TABLES, table

    want = {
        "events": {
            "event_id": "bigint",
            "ts": "timestamp",  # normalize_ts contract
            "user_id": "bigint",
            "event_type": "string",
            "value": "double",
            "props": "string",
        },
        "documents": {
            "doc_id": "bigint",
            "text": "string",
            "lang": "string",
            "source": "string",
            "n_chars": "bigint",
        },
        "embeddings": {
            "vec_id": "bigint",
            "embedding": "array<float>",
            "label": "int",
        },
        "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp_ntz"},
        "lineitem": {"l_orderkey": "bigint", "l_shipdate": "timestamp_ntz"},
        "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
    }
    drift = {}
    for name in TABLES:
        if name not in want:
            continue
        got = dict(table(spark, SF_SMOKE, name).dtypes)
        for col, dt in want[name].items():
            if got.get(col) != dt:
                drift[f"{name}.{col}"] = f"want {dt}, got {got.get(col)}"
    assert drift == {}, drift
