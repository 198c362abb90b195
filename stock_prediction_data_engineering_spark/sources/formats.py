"""Interchange formats beyond parquet: JSONL, CSV, ORC.

The reference ingests CSV (screener) and emits CSV per symbol
(/root/reference/data_collection/dags/stock_data_airflow_local_aws_s3.py:44-63);
a complete engine also speaks JSONL (the lingua franca of LLM corpus
interchange) and ORC (the other columnar lake format Spark ships
in-box).

Scale rules encoded here:

- ALWAYS pass an explicit schema on read. Schema inference reads the
  data twice (JSON/CSV samplers scan files before the real job) and
  can silently widen types between runs — on a 100 TB lake that is
  both a double scan and a correctness hazard.
- Timestamps round-trip through an explicit ISO-8601 microsecond
  format; JSON/CSV have no native timestamp type, so an unpinned
  format is an engine-version-dependent behavior.
- Text formats are for interchange, not analytics: no column pruning,
  no predicate pushdown, no row-group skipping. Land them into
  parquet (sources/lake.py) before querying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
# TIMESTAMP_NTZ columns are formatted by the *separate*
# timestampNTZFormat option (its default truncates to millis, which
# silently drops µs on the round-trip); pin a µs pattern for it too.
# No zone designator — NTZ carries none.
TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _ts_opts(rw):
    return rw.option("timestampFormat", TS_FMT).option(
        "timestampNTZFormat", TS_NTZ_FMT
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    _ts_opts(df.write.mode("overwrite")).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return _ts_opts(spark.read.schema(schema)).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    _ts_opts(df.write.mode("overwrite").option("header", "true")).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return _ts_opts(spark.read.schema(schema).option("header", "true")).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC is self-describing columnar — schema travels with the file,
    # and pruning/pushdown work as with parquet.
    return spark.read.orc(path)
