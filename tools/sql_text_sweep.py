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
            ra = sorted(map(tuple, df_api.collect()))
            rs = sorted(map(tuple, df_sql.collect()))
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
    print(json.dumps({"ok": ok, "n_ok": len(ok), "n_fail": len(fail)}))
    spark.stop()


if __name__ == "__main__":
    main()
