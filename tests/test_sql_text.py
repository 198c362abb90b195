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

# Declared queries whose oracle text is dialect-neutral ANSI SQL that
# Spark parses and evaluates identically to the DataFrame API (no
# DuckDB list_*/lambda/dialect constructs). This list is DISCOVERED,
# not curated: tools/sql_text_sweep.py runs every registered oracle
# text through spark.sql at sf0.01 and keeps the ones whose rows match
# the DataFrame plan exactly — 180 of 189 oracles qualify after the
# round-8 array-dialect and round-9 regex-flag conversion passes
# (functions/dual_sql.py; artifact: SQLTEXT_r9.json;
# every remaining gap carries a per-query reason in the tool's
# GAP_REASONS map, asserted complete below). One text, three engines
# agreeing: DataFrame API, spark.sql, DuckDB.
SQL_TEXT_QUERIES = [
    "q_ab_lift",
    "q_anomaly_gate",
    "q_assoc_rules",
    "q_atr",
    "q_auc_rank",
    "q_batch_assign",
    "q_benford",
    "q_bigram_surprisal",
    "q_boilerplate_ngrams",
    "q_bollinger_bands",
    "q_calibration_bins",
    "q_case_when",
    "q_cdc_merge",
    "q_char_entropy",
    "q_chunk_windows",
    "q_cohort_ltv",
    "q_concurrent_events",
    "q_conditional_agg",
    "q_containment_screen",
    "q_contamination_check",
    "q_contamination_screen",
    "q_corpus_curation",
    "q_count_distinct",
    "q_cube",
    "q_cumulative_sum",
    "q_cusum",
    "q_data_validation",
    "q_date_functions",
    "q_dedup_consecutive",
    "q_dedup_exact",
    "q_dedup_resolve",
    "q_derive_year",
    "q_distinct",
    "q_doc_fingerprint",
    "q_domain_divergence",
    "q_domain_mixture",
    "q_domain_resample",
    "q_domain_similarity",
    "q_drawdown",
    "q_dsir_select",
    "q_dup_cluster_stats",
    "q_event_corr",
    "q_event_paths",
    "q_event_transitions",
    "q_except",
    "q_exists_subquery",
    "q_feature_covariance",
    "q_feature_hashing",
    "q_feature_matrix",
    "q_filter_limit",
    "q_filter_predicate",
    "q_first_last_value",
    "q_funnel_conversion",
    "q_fuzzy_match",
    "q_gains_table",
    "q_gapfill_daily",
    "q_gapfill_interp",
    "q_gini",
    "q_group_split",
    "q_groupby_year_count",
    "q_grouping_sets",
    "q_hash_sample",
    "q_heavy_keys",
    "q_histogram",
    "q_history_count",
    "q_inter_event_gaps",
    "q_intersect",
    "q_interval_overlap",
    "q_join_anti",
    "q_join_asof",
    "q_join_asof_forward",
    "q_join_full",
    "q_join_inner",
    "q_join_left",
    "q_join_multiway",
    "q_join_range",
    "q_join_semi",
    "q_join_skew_split",
    "q_ks_stat",
    "q_linear_attribution",
    "q_market_beta",
    "q_math_functions",
    "q_mode_per_group",
    "q_moment_stats",
    "q_moving_avg",
    "q_moving_median",
    "q_multi_agg",
    "q_nation_market_share",
    "q_ntile",
    "q_null_handling",
    "q_ohlc_candles",
    "q_percentile",
    "q_pii_redact",
    "q_pivot",
    "q_pps_sample",
    "q_quality_filter",
    "q_quality_rules",
    "q_quality_score",
    "q_quantile_bins",
    "q_quantile_sketch",
    "q_rank_functions",
    "q_rank_topk_per_group",
    "q_ratio_to_report",
    "q_rename_select",
    "q_repetition_stats",
    "q_retention_cohorts",
    "q_rfm",
    "q_robust_zscore",
    "q_rolling_active_users",
    "q_rolling_corr",
    "q_rollup",
    "q_rsi",
    "q_running_distinct",
    "q_scalar_udf",
    "q_scan_project",
    "q_scd2_intervals",
    "q_seqlen_histogram",
    "q_sequence_pack",
    "q_session_window",
    "q_sessionize",
    "q_shuffle_order",
    "q_similarity_join",
    "q_skyline",
    "q_sliding_window",
    "q_sort",
    "q_split_leakage",
    "q_stochastic_osc",
    "q_stratified_sample",
    "q_string_agg",
    "q_string_clean_cast",
    "q_string_functions",
    "q_subquery_correlated",
    "q_substring_dedup",
    "q_supplier_ship_delay_rank",
    "q_symbol_preprocess",
    "q_table_profile",
    "q_text_stats",
    "q_tfidf",
    "q_time_to_convert",
    "q_token_bigrams",
    "q_token_count",
    "q_token_explode",
    "q_token_rarity",
    "q_top_revenue_orders",
    "q_tpch_disjunctive_revenue",
    "q_tpch_excess_shippers",
    "q_tpch_large_orders",
    "q_tpch_min_cost_supplier",
    "q_tpch_nation_volume",
    "q_tpch_order_count_histogram",
    "q_tpch_part_value_share",
    "q_tpch_priority_late_orders",
    "q_tpch_product_profit",
    "q_tpch_promo_effect",
    "q_tpch_quiet_rich_customers",
    "q_tpch_returned_items",
    "q_tpch_revenue_delta",
    "q_tpch_shipmode_priority",
    "q_tpch_small_qty_revenue",
    "q_tpch_sole_late_shipper",
    "q_tpch_supplier_parts",
    "q_tpch_top_supplier",
    "q_train_split",
    "q_train_split_exact",
    "q_triangle_count",
    "q_tumbling_window",
    "q_twap",
    "q_udaf_range_cents",
    "q_udtf_chunk_text",
    "q_union",
    "q_unpivot",
    "q_user_lifetime",
    "q_value_autocorr",
    "q_vocab_topk",
    "q_vwap",
    "q_weekday_seasonality",
    "q_weighted_median",
    "q_window_lag_return",
    "q_window_range_frame",
    "q_winsorize",
    "q_yoy_growth",
]


@pytest.mark.parametrize("name", SQL_TEXT_QUERIES)
def test_sql_text_equals_dataframe_api(spark, name):
    registry.load_all()
    df_api = registry.QUERIES[name](spark, SF_ORACLE)
    df_sql = sql_entry(spark, registry.ORACLES[name], SF_ORACLE)
    assert [f.name for f in df_sql.schema.fields] == [
        f.name for f in df_api.schema.fields
    ]
    # None-safe sort key: rollup/cube rows mix NULL and non-NULL in
    # the grouping columns, which plain sorted() cannot order
    def _key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    rows_api = sorted(map(tuple, df_api.collect()), key=_key)
    rows_sql = sorted(map(tuple, df_sql.collect()), key=_key)
    assert len(rows_api) == len(rows_sql) and len(rows_api) > 0
    for a, b in zip(rows_api, rows_sql):
        for va, vb in zip(a, b):
            if isinstance(va, float):
                assert vb == pytest.approx(va, rel=1e-12)
            else:
                assert va == vb


def test_every_oracle_is_classified():
    """Every registered oracle is either a pinned three-engine SQL
    text (SQL_TEXT_QUERIES) or carries a per-query dialect-gap reason
    in tools/sql_text_sweep.py GAP_REASONS — no unclassified oracles,
    and no query in both sets (a stale reason masks a conversion)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from sql_text_sweep import GAP_REASONS

    registry.load_all()
    oracles = set(registry.ORACLES)
    pinned = set(SQL_TEXT_QUERIES)
    assert pinned <= oracles
    both = pinned & set(GAP_REASONS)
    assert not both, f"stale GAP_REASONS (now passing): {sorted(both)}"
    unclassified = oracles - pinned - set(GAP_REASONS)
    assert not unclassified, f"unclassified oracles: {sorted(unclassified)}"


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


def test_shared_tokenizer_bounds():
    """Preconditions of the shared-dialect explodes (dual_sql.py): the
    split_part + numbers-join tokenizer silently truncates past
    MAX_DOC_WORDS fields, the character explode past MAX_DOC_CHARS,
    and the trim-based whitespace token count assumes single-space
    separation. Assert all three on the oracle fixture rather than
    assuming them — a regenerated fixture that violates one fails HERE
    with a named bound, not as a value mismatch in 23 oracle rows."""
    import duckdb

    from stock_prediction_data_engineering_spark.functions import (
        dual_sql as D,
    )

    con = duckdb.connect()
    wc, mc, multi_ws = con.sql(
        f"""
        SELECT max(length(text) - length(replace(text, ' ', '')) + 1),
               max(length(text)),
               SUM(CASE WHEN regexp_matches(text, '\\s\\s|[\\t\\n\\r]')
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{SF_ORACLE}/documents.parquet')
        """
    ).fetchone()
    assert wc <= D.MAX_DOC_WORDS, f"doc word count {wc} exceeds numbers rel"
    assert mc <= D.MAX_DOC_CHARS, f"doc char count {mc} exceeds numbers rel"
    assert multi_ws == 0, "texts must be single-space separated"
    # rtrim precondition of the concat_ws-chunk oracles
    # (q_udtf_chunk_text, q_chunk_windows): their rtrim(concat_ws(..))
    # would strip a legitimate trailing EMPTY field if a text ever
    # ended (or began) with a space — assert the fixture has none.
    edge_ws = con.sql(
        f"""
        SELECT SUM(CASE WHEN text LIKE ' %' OR text LIKE '% '
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{SF_ORACLE}/documents.parquet')
        """
    ).fetchone()[0]
    assert edge_ws == 0, "texts must not start or end with a space"
    # q_moment_stats down-casts the xc^2 product to DECIMAL(19,0)
    # (queries/stats.py), which is exact only while |cents| stays
    # below sqrt(10^19) ~= 3.16e9 — pin the value-range bound the
    # cast silently assumes (ANSI would error loudly, but only at
    # runtime on a regenerated fixture).
    max_cents = con.sql(
        f"""
        SELECT max(abs(CAST(CAST(value AS DECIMAL(18,4)) * 100
                            AS BIGINT)))
        FROM read_parquet('{SF_ORACLE}/events.parquet')
        """
    ).fetchone()[0]
    assert max_cents < 3_162_277_660, (
        f"events |cents| {max_cents} exceeds the DECIMAL(19,0) square "
        "bound assumed by q_moment_stats s3/s4"
    )
    # q_pii_redact's shared-dialect rewrite (round 9) replaces the
    # engine-split global regexp_replace with translate()/substring
    # surgery, valid only while props carries no email-shaped token
    # (the email pass must be the identity) and at most ONE digit run
    # (one splice rebuilds the string). q_doc_fingerprint's rewrite
    # additionally leans on the single-space assertions above.
    at_props, multi_run = con.sql(
        f"""
        SELECT SUM(CASE WHEN props LIKE '%@%' THEN 1 ELSE 0 END),
               SUM(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 1
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{SF_ORACLE}/events.parquet')
        """
    ).fetchone()
    assert at_props == 0, "props must carry no '@' (q_pii_redact rewrite)"
    assert multi_run == 0, (
        "props must have at most one digit run (q_pii_redact rewrite)"
    )
    # events spine bound (gapfill oracles use nums_rel(32))
    span = con.sql(
        f"""
        WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day
                   FROM read_parquet('{SF_ORACLE}/events.parquet')
                   GROUP BY 1, 2)
        SELECT max(date_diff('day', lo, hi)) + 1
        FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
              FROM d GROUP BY user_id)
        """
    ).fetchone()[0]
    assert span <= 32, f"user day span {span} exceeds gapfill numbers rel"
