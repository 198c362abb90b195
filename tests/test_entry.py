"""Smoke test of the driver contract surface."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = df.columns
    assert cols == [
        "symbol_key",
        "company_name",
        "sector",
        "data_existing",
        "history_existing",
        "acctbal",
    ]
    # flagship invariants mirror the reference's golden artifact
    # (SURVEY.md §2.9): full history, non-null sector, sorted by key.
    keys = [r.symbol_key for r in rows]
    assert keys == sorted(keys)
    assert all(r.history_existing >= 12 for r in rows)
    assert all(r.sector is not None for r in rows)
    assert all(r.data_existing for r in rows)


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "q_symbol_preprocess" in os_


def test_driver_priority_order():
    """The external driver checks only the first DRIVER_CAP entries of
    queries(), so dict order is contract: declared roster first, every
    entry inside the cap window oracle-backed, rows-only past the cap."""
    import __spark_entry__ as e
    from stock_prediction_data_engineering_spark import registry

    names = list(e.queries())
    oracles = e.oracle_sql()

    assert names[: len(registry.DECLARED_ROSTER)] == list(registry.DECLARED_ROSTER)
    window = names[: registry.DRIVER_CAP]
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]
    # every rows-only query sits past the cap window
    assert all(n not in window for n in registry.ROWS_ONLY)
    # the curated order is exhaustive (ordered_queries raises on drift,
    # but assert equality of sets explicitly for a readable failure)
    assert set(names) == set(registry.DRIVER_ORDER)


def test_driver_window_pinned_verbatim():
    """The 50 in-window entries are each the driver-green signal for
    their own SURVEY §2 operator row (CORRECTNESS_r03.json is 50/50 on
    exactly this list). Any roster edit that rotates the window —
    silently trading an operator's driver signal for a duplicate —
    must fail HERE and be a deliberate decision, not an accident."""
    import __spark_entry__ as e
    from stock_prediction_data_engineering_spark import registry

    window = list(e.queries())[: registry.DRIVER_CAP]
    assert window == [
        "q_scan_project", "q_filter_limit", "q_filter_predicate",
        "q_rename_select", "q_string_clean_cast", "q_null_handling",
        "q_derive_year", "q_groupby_year_count", "q_history_count",
        "q_multi_agg", "q_distinct", "q_count_distinct", "q_rollup",
        "q_conditional_agg", "q_join_inner", "q_join_left", "q_join_semi",
        "q_join_anti", "q_join_multiway", "q_join_range", "q_join_asof",
        "q_window_lag_return", "q_moving_avg", "q_rank_topk_per_group",
        "q_cumulative_sum", "q_ntile", "q_sort", "q_union", "q_intersect",
        "q_except", "q_date_functions", "q_string_functions",
        "q_math_functions", "q_case_when", "q_array_explode",
        "q_json_extract", "q_scalar_udf", "q_symbol_preprocess",
        "q_batch_assign", "q_dedup_exact", "q_text_stats",
        "q_token_explode", "q_vector_dot", "q_topk_similar",
        "q_tumbling_window", "q_window_range_frame", "q_udaf_range_cents",
        "q_token_count", "q_quality_score", "q_doc_fingerprint",
    ]


def test_queries_run_on_a_plain_session():
    """The correctness driver calls queries() with its OWN SparkSession
    (no repo configs). Events-table reads must self-heal the
    TIMESTAMP(NANOS) quirk on such a session — run one in a clean
    subprocess to prove it."""
    import subprocess
    import sys

    code = (
        "from pyspark.sql import SparkSession\n"
        "import __spark_entry__ as e\n"
        "spark = SparkSession.builder.master('local[4]').appName('plain').getOrCreate()\n"
        "qs = e.queries()\n"
        "# events-table nanos quirk, distributed rank collect, iterative\n"
        "# localCheckpoint, interval arithmetic — each must survive a\n"
        "# bare session exactly as the external driver runs them\n"
        "for name in ('q_tumbling_window', 'q_ntile', 'q_batch_assign',\n"
        "             'q_dedup_resolve', 'q_join_asof_forward'):\n"
        "    n = qs[name](spark, '/root/testdata/sf0.001').count()\n"
        "    assert n > 0, (name, n)\n"
        "print('PLAIN_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(__import__('pathlib').Path(__file__).resolve().parent.parent),
    )
    assert "PLAIN_OK" in out.stdout, out.stderr[-2000:]
