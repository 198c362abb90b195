"""Discover which registered oracle texts are a three-engine witness.

Every declared query's oracle is written in dialect-neutral ANSI where
possible. This sweep runs EACH oracle text through spark.sql over the
same testdata views the DataFrame plan reads and keeps the ones whose
column names and row values match the DataFrame-API result exactly —
proving, per query, that one SQL text means the same thing to the
DataFrame API, Spark SQL, and DuckDB (the driver's oracle side).

The passing set is pinned in tests/test_sql_text.py (SQL_TEXT_QUERIES)
and recorded in SQLTEXT_r6.json; re-run this sweep after adding
oracles to grow the pinned list.

Usage: python tools/sql_text_sweep.py   # env: SPARK_GRAFT_SF_DIR
Prints one line per oracle (OK / failure class), then a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Per-query reason for every oracle that is NOT dual-dialect (round-7
# classification). Each remaining gap is a genuine dialect/engine
# difference with no common-subset expression — the round-7 conversion
# pass already moved everything expressible (integer division via
# (a - a%b)/b, VARCHAR->STRING, FILTER(WHERE), percentile_cont WITHIN
# GROUP, min_by/max_by, split()/filter()-lambda common subset,
# separator-count word counts, bin()-based log2 buckets). The sweep
# fails if a query fails WITHOUT a reason here, or if a reason goes
# stale (query now passes) — same exact-allowlist discipline as
# tools/plan_lint.py.
R_LIST = (
    "array dialect: DuckDB string_split/unnest/list_*/[] vs Spark "
    "split/explode/LATERAL VIEW — no common flatten or list-length"
)
R_TIME = (
    "time dialect: DuckDB epoch_us()/epoch()/strftime()/quoted "
    "date_diff units vs Spark unix_micros()/date_format()/bare units"
)
R_128 = (
    "needs 128-bit integer intermediates (DuckDB HUGEINT); Spark's "
    "widest integer is BIGINT and DECIMAL(38) changes division "
    "semantics"
)
R_REGEX_G = (
    "regex-flag dialect: DuckDB regexp_replace needs 'g' for global, "
    "Spark is global-by-default and rejects the flag argument"
)
R_JSON = "json dialect: DuckDB json_extract_string/json_keys vs Spark get_json_object/json_object_keys"
GAP_REASONS: dict[str, str] = {
    # array/lateral family: 23 of the round-7 R_LIST rows CLOSED in
    # round 8 via the shared-subset explodes (functions/dual_sql.py:
    # split_part + VALUES-numbers join for space tokens and word
    # n-grams, gaps-and-islands character explode for regex-run
    # tokenization, positional hex decode for md5 bucketing, and the
    # count-over-grouping identity for IGNORE NULLS fills). What
    # remains is genuinely list-VALUED or engine-bound:
    "q_array_explode": R_LIST + " (array-valued demo is the point)",
    "q_array_hof": R_LIST + " (and list_sum/list_transform)",
    "q_label_centroids": R_LIST + " (struct_pack)",
    "q_segment_dedup_clean": R_LIST + " (list_slice + struct literal)",
    # vector ops
    "q_vector_dot": "DuckDB list_dot_product + DOUBLE[] cast vs Spark aggregate/zip_with lambdas",
    "q_topk_similar": "DuckDB list_dot_product + DOUBLE[] cast vs Spark aggregate/zip_with lambdas",
    # time family: CLOSED in round 8 — DuckDB epoch()/epoch_us()/
    # date_diff()/strftime()/dayofweek rewritten into the explicit-
    # extract common subset (functions/dual_sql.py: interval-day
    # extraction, string-fraction microseconds, Sunday-anchored day
    # counts, CAST-AS-STRING rendering). All 16 former R_TIME/dow
    # queries are now pinned three-engine texts.
    # 128-bit family: CLOSED in round 8 — HUGEINT intermediates
    # re-expressed as width-disciplined DECIMAL products
    # (dual_sql.dprod): operand widths sum <= 38 so DuckDB's
    # type-level width cap and Spark's DECIMAL(38,0) precision cap
    # both stay exact; higher powers split via a DECIMAL(19,0)
    # square (x^4 = (x^2)^2). All 7 former R_128 rows pinned.
    # regex-flag rows CLOSED in round 9: q_doc_fingerprint's
    # whitespace normalization is the identity under the pinned
    # single-space fixture preconditions, and q_pii_redact's global
    # replace became translate()/substring surgery under the pinned
    # no-'@' / single-digit-run preconditions (both asserted in
    # tests/test_sql_text.py::test_shared_tokenizer_bounds).
    # json
    "q_json_extract": R_JSON,
    "q_map_functions": R_JSON,
    # one-offs: none. q_string_agg closed in round 10 — grouped
    # ordered aggregation has no shared syntax, but the WINDOWED
    # string_agg with an explicit unbounded frame parses and orders
    # identically on both engines (+ DISTINCT to collapse groups).
}


def canon_key(row: tuple):
    """None-safe, type-stable sort key: plain sorted() raises TypeError
    on rows mixing NULL and non-NULL in a column (rollup/cube totals),
    which mis-classified those queries as value mismatches."""
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def main() -> None:
    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.catalog import sql_entry
    from stock_prediction_data_engineering_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry.load_all()
    spark = get_spark(app_name="sqltext-sweep")
    ok, fail = [], {}
    for name, sql in sorted(registry.ORACLES.items()):
        try:
            df_api = registry.QUERIES[name](spark, sf_dir)
            df_sql = sql_entry(spark, sql, sf_dir)
            if [f.name for f in df_sql.schema.fields] != [
                f.name for f in df_api.schema.fields
            ]:
                fail[name] = "schema-names"
                continue
            ra = sorted(map(tuple, df_api.collect()), key=canon_key)
            rs = sorted(map(tuple, df_sql.collect()), key=canon_key)
            if len(ra) != len(rs) or not ra:
                fail[name] = f"rowcount {len(ra)} vs {len(rs)}"
                continue
            bad = False
            for a, b in zip(ra, rs):
                for va, vb in zip(a, b):
                    if isinstance(va, float) and isinstance(vb, float):
                        if abs(va - vb) > 1e-9 * max(1.0, abs(va)):
                            bad = True
                            break
                    elif va != vb:
                        bad = True
                        break
                if bad:
                    break
            if bad:
                fail[name] = "values"
            else:
                ok.append(name)
        except Exception as exc:  # noqa: BLE001 — classify, keep sweeping
            fail[name] = type(exc).__name__
        print(f"{name}: {'OK' if name in ok else fail.get(name)}", flush=True)
    unexplained = sorted(set(fail) - set(GAP_REASONS))
    stale = sorted(set(GAP_REASONS) & set(ok))
    print(
        json.dumps(
            {
                "ok": ok,
                "n_ok": len(ok),
                "n_fail": len(fail),
                "fail": fail,
                "gap_reasons": {
                    k: GAP_REASONS[k] for k in sorted(fail) if k in GAP_REASONS
                },
                # exact-classification discipline: every gap carries a
                # reason; a reason whose query now passes must be removed
                "unexplained_failures": unexplained,
                "stale_reasons": stale,
            }
        )
    )
    spark.stop()
    sys.exit(1 if (unexplained or stale) else 0)


if __name__ == "__main__":
    main()
