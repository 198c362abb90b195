"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``stock_prediction_data_engineering_spark``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stock_prediction_data_engineering_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q_symbol_preprocess: the reference's one recoverable end-to-end
    query (SURVEY.md §2.9) rebased onto the testdata star schema.
    """
    registry.load_all()
    return registry.QUERIES["q_symbol_preprocess"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Returned in curated priority order (registry.DRIVER_ORDER): the 45
    SURVEY-declared queries first, then oracle-backed extras, then
    rows-only queries — so a driver that checks only the first N entries
    validates every declared, hash-checkable operator.
    """
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name (subset of ``queries()`` —
    rows-only operators are intentionally absent)."""
    return registry.ordered_oracles()
