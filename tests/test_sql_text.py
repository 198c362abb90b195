"""SQL-text front-end (SURVEY §2.18 'SQL text for free'): the engine's
operators are Catalyst plans, so every DataFrame-API query is equally
runnable as SQL text through catalog.sql_entry. These tests PROVE the
claim instead of asserting it: representative declared queries run
both ways and must return identical rows.

The SQL texts used are the queries' own registered oracle strings —
they are written in dialect-neutral ANSI SQL precisely so DuckDB and
Spark agree on them, which makes them the strongest possible witness:
one text, three engines (DataFrame API, spark.sql, DuckDB) agreeing.
"""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE

from stock_prediction_data_engineering_spark import registry
from stock_prediction_data_engineering_spark.catalog import sql_entry

# Declared queries whose oracle text is dialect-neutral Spark SQL
# (no DuckDB list_* / lambda constructs): one per operator family —
# aggregate, keyed aggregate, multi-agg scan, distinct, star join,
# window top-k, set op.
SQL_TEXT_QUERIES = [
    "q_groupby_year_count",
    "q_history_count",
    "q_multi_agg",
    "q_distinct",
    "q_join_multiway",
    "q_rank_topk_per_group",
    "q_union",
]


@pytest.mark.parametrize("name", SQL_TEXT_QUERIES)
def test_sql_text_equals_dataframe_api(spark, name):
    registry.load_all()
    df_api = registry.QUERIES[name](spark, SF_ORACLE)
    df_sql = sql_entry(spark, registry.ORACLES[name], SF_ORACLE)
    assert [f.name for f in df_sql.schema.fields] == [
        f.name for f in df_api.schema.fields
    ]
    rows_api = sorted(map(tuple, df_api.collect()))
    rows_sql = sorted(map(tuple, df_sql.collect()))
    assert len(rows_api) == len(rows_sql) and len(rows_api) > 0
    for a, b in zip(rows_api, rows_sql):
        for va, vb in zip(a, b):
            if isinstance(va, float):
                assert vb == pytest.approx(va, rel=1e-12)
            else:
                assert va == vb


def test_sql_entry_is_a_full_front_end(spark):
    """sql_entry runs arbitrary NEW SQL text over the testdata views
    (not just pre-registered queries), with joins, windows and CTEs."""
    out = sql_entry(
        spark,
        """
        WITH big AS (
          SELECT o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC) AS rn
          FROM orders
        )
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_top_orders,
               CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS top_value
        FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
        WHERE b.rn = 1
        GROUP BY c.c_mktsegment
        ORDER BY segment
        """,
        SF_ORACLE,
    ).collect()
    assert len(out) == 5  # the five TPC-H market segments
    assert all(r.n_top_orders > 0 and r.top_value > 0 for r in out)
