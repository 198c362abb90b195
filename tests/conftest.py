from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Measured-slow tests (see pytest.ini): nodeids or whole files listed
# in slow_tests.txt get the `slow` marker, which addopts deselects by
# default so the driver's bounded verify window completes. Every pin
# stays runnable via `pytest -m slow`.
_SLOW_LIST = Path(__file__).parent / "slow_tests.txt"


def pytest_collection_modifyitems(config, items):
    entries = {
        ln.strip()
        for ln in _SLOW_LIST.read_text().splitlines()
        if ln.strip() and not ln.startswith("#")
    }
    files = {e for e in entries if "::" not in e}
    for item in items:
        nid = item.nodeid
        if nid in entries or nid.split("::", 1)[0] in files:
            item.add_marker(pytest.mark.slow)


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
