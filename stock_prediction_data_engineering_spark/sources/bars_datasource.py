"""`stockbars` — a PySpark Python DataSource for per-symbol bar fetch.

The reference's ingestion is an imperative loop over symbols calling
yf.download (reference dags/stock_data_airflow_local_aws_s3.py:110-112,
:36-42). ``api_source.fetch_bars`` models that as a mapInPandas stage;
this module is the other Spark-native form (SURVEY.md §2.1 S2): a
declarative source for the PySpark Python Data Source API
(``spark.read.format("stockbars")``), where each symbol is one input
partition — so fetch fan-out is Spark's own task scheduling, retries
are task retries, and downstream pushdown/pruning see a normal scan.

Offline environment: rows come from ``api_source.synthetic_fetch``
(deterministic, yfinance-shaped). A networked deployment swaps the
fetch function; the source contract is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from .api_source import BAR_SCHEMA, synthetic_fetch

FORMAT_NAME = "stockbars"


class SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class BarsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s for s in (options.get("symbols", "") or "").split(",") if s
        ]
        if not self.symbols:
            raise ValueError("stockbars requires option 'symbols' (comma-separated)")
        self.start = options.get("start", "2000-01-01")
        self.end = options.get("end", "2024-10-01")

    def partitions(self) -> list[InputPartition]:
        # one task per symbol: the reference's per-symbol loop becomes
        # scheduler-managed parallelism
        return [SymbolPartition(s) for s in self.symbols]

    def read(self, partition: SymbolPartition) -> Iterator[tuple]:
        try:
            pdf = synthetic_fetch(partition.symbol, self.start, self.end)
        except Exception as exc:  # quarantine row, never silent drop
            yield (partition.symbol, None, None, None, None, None, None, None,
                   f"{type(exc).__name__}: {exc}")
            return
        for row in pdf.itertuples(index=False):
            yield tuple(row)


class BarsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return BAR_SCHEMA

    def reader(self, schema: StructType) -> BarsReader:
        return BarsReader(self.options)


def register(spark) -> None:
    """Make ``spark.read.format("stockbars")`` available on a session."""
    spark.dataSource.register(BarsDataSource)
