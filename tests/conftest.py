from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from stock_prediction_data_engineering_spark.session import get_spark

    s = get_spark(app_name="tests", driver_mem="8g")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the sf0.01 testdata tables registered as
    views — mirrors the driver's oracle environment."""
    import duckdb

    from stock_prediction_data_engineering_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
