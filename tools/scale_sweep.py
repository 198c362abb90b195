"""Full-suite scale sweep: run EVERY oracle-backed query against its
DuckDB oracle at an arbitrary sf directory (default: the replicated
sf1 from tools/gen_scale.py), and every rows-only query for non-empty
execution, recording per-query wall time and exact-match status.

This converts the repo's 100 TB design arguments into committed
measurements one decade up from the bench's sf0.1: correctness must
hold exactly (the same canonicalized frame compare the in-repo parity
suite uses), and per-query time is recorded so a second run at a
different sf exposes super-linear queries.

Usage:
    python tools/scale_sweep.py [--sf-dir .data/sf1] [--out SWEEP_r4.json]
        [--skip-rows-only]

Output JSON: {"sf_dir": ..., "n_ok": N, "n_fail": N, "failures": [...],
    "queries": {name: {"ok": bool, "rows": n, "sec": t}, ...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / ".data/sf1"))
    ap.add_argument("--out", default="")
    ap.add_argument("--skip-rows-only", action="store_true")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument(
        "--exec-only",
        action="store_true",
        help="execute every query with a distributed count() and record "
        "rows/time/failures, skipping the DuckDB compare — the mode for "
        "scales where some answer sets no longer fit the driver "
        "(sf10's contamination audit is 231M rows) but runtime failures "
        "(ANSI overflow, OOM, plan errors) must still surface",
    )
    ap.add_argument(
        "--max-compare-rows",
        type=int,
        default=0,
        help="when >0, value-compare only queries whose Spark result has "
        "at most this many rows; larger answer sets run exec-only with a "
        "recorded size reason (sf10's contamination audit is 231M rows — "
        "the driver-side compare, not the query, is what doesn't fit)",
    )
    ap.add_argument(
        "--skip-oracle",
        default="",
        help="comma-separated NAME=reason pairs: run the Spark side "
        "exec-only and record the reason, for queries whose DuckDB "
        "oracle COMPUTATION is infeasible at this scale (e.g. "
        "q_similarity_join's brute-force O(n^2) self-join)",
    )
    args = ap.parse_args()

    import duckdb

    from test_oracle_parity import canonicalize

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.catalog import TABLES
    from stock_prediction_data_engineering_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name="scale_sweep",
        driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    # fixture bound maxima vs the dual_sql constants, ALWAYS — most
    # important under --exec-only, where the DuckDB compare is skipped
    # and a doc past MAX_DOC_WORDS/CHARS (or a user day span past the
    # gapfill nums_rel spine) would truncate oracle results SILENTLY
    # at that scale; exactness is otherwise only pinned at <= sf1.
    # Same aggregates as tests/test_sql_text.py::
    # test_shared_tokenizer_bounds, recomputed on THIS sweep's fixture.
    from stock_prediction_data_engineering_spark.functions import (
        dual_sql as dsql,
    )

    bounds: dict[str, int] = {}
    wc, mc, edge = con.sql(
        "SELECT max(length(text) - length(replace(text, ' ', '')) + 1), "
        "max(length(text)), "
        "SUM(CASE WHEN text LIKE ' %' OR text LIKE '% ' THEN 1 ELSE 0 END) "
        "FROM documents"
    ).fetchone()
    span = con.sql(
        "WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events "
        "GROUP BY 1, 2) "
        "SELECT max(date_diff('day', lo, hi)) + 1 FROM ("
        "SELECT user_id, min(day) AS lo, max(day) AS hi FROM d "
        "GROUP BY user_id)"
    ).fetchone()[0]
    bounds = {
        "max_doc_words": int(wc),
        "max_doc_chars": int(mc),
        "edge_space_texts": int(edge),
        "max_user_day_span": int(span),
    }
    bound_errs = []
    if wc > dsql.MAX_DOC_WORDS:
        bound_errs.append(f"doc word count {wc} > {dsql.MAX_DOC_WORDS}")
    if mc > dsql.MAX_DOC_CHARS:
        bound_errs.append(f"doc char count {mc} > {dsql.MAX_DOC_CHARS}")
    if edge:
        bound_errs.append(f"{edge} texts with leading/trailing space")
    if span > 32:
        bound_errs.append(f"user day span {span} > gapfill nums_rel(32)")
    if bound_errs:
        print(f"BOUND VIOLATIONS at {args.sf_dir}: {bound_errs}", flush=True)

    only = set(args.only.split(",")) if args.only else None
    skip_oracle: dict[str, str] = {}
    if args.skip_oracle:
        for pair in args.skip_oracle.split(","):
            n, _, reason = pair.partition("=")
            skip_oracle[n.strip()] = reason.strip() or "oracle infeasible"
    results: dict[str, dict] = {}
    failures: list[str] = list(bound_errs)

    for name in sorted(registry.QUERIES):
        if only and name not in only:
            continue
        has_oracle = name in registry.ORACLES
        if args.skip_rows_only and not has_oracle:
            continue
        t0 = time.monotonic()
        try:
            if args.exec_only:
                n_rows = registry.QUERIES[name](spark, args.sf_dir).count()
                rec = {
                    "ok": bool(n_rows >= 0),
                    "oracle": False,
                    "rows": int(n_rows),
                    "sec": round(time.monotonic() - t0, 3),
                }
                results[name] = rec
                print(f"{'OK ' if rec['ok'] else 'FAIL'} {name} "
                      f"rows={rec['rows']} {rec['sec']}s", flush=True)
                spark.catalog.clearCache()
                continue
            skip_reason = skip_oracle.get(name)
            n_rows = None
            if skip_reason is None and args.max_compare_rows:
                # row-bounded compare/collect: the Spark side runs twice
                # (a distributed count, then the collected compare) —
                # honest double cost, but it keeps a huge answer set
                # from ever being collected to the driver. The bound
                # guards rows-only queries too: their non-empty check
                # below is a full toPandas(), and q_dedup_minhash's
                # answer at sf10 is 1.5 B member pairs — collecting it
                # OOM-killed the whole local-mode JVM (round-10 sweep).
                n_rows = registry.QUERIES[name](spark, args.sf_dir).count()
                if n_rows > args.max_compare_rows:
                    skip_reason = (
                        f"answer set {n_rows} rows > "
                        f"{'compare' if has_oracle else 'collect'} bound "
                        f"{args.max_compare_rows}"
                    )
            if skip_reason is not None:
                if n_rows is None:
                    n_rows = registry.QUERIES[name](spark, args.sf_dir).count()
                rec = {
                    "ok": bool(n_rows >= 0),
                    "oracle": False,
                    "rows": int(n_rows),
                    "sec": round(time.monotonic() - t0, 3),
                    "compare_skipped": skip_reason,
                }
                results[name] = rec
                print(f"{'OK ' if rec['ok'] else 'FAIL'} {name} "
                      f"rows={rec['rows']} {rec['sec']}s "
                      f"(exec-only: {skip_reason})", flush=True)
                spark.catalog.clearCache()
                continue
            sdf = registry.QUERIES[name](spark, args.sf_dir).toPandas()
            if has_oracle:
                odf = con.sql(registry.ORACLES[name]).df()
                a, b = canonicalize(sdf), canonicalize(odf)
                ok = len(a) == len(b) and a.astype(str).equals(b.astype(str))
            else:
                ok = len(sdf) > 0
            rec = {
                "ok": bool(ok),
                "oracle": has_oracle,
                "rows": int(len(sdf)),
                "sec": round(time.monotonic() - t0, 3),
            }
        except Exception as exc:  # noqa: BLE001 — fault-isolate per query
            # stringifying a py4j exception needs a LIVE gateway: after
            # a JVM death (executor OOM kills local-mode Spark whole)
            # str(exc) itself raises and used to crash the sweep with
            # the partial artifact unwritten (round-10 sf10 run)
            try:
                msg = f"{type(exc).__name__}: {exc}"[:300]
            except Exception:  # noqa: BLE001
                msg = f"{type(exc).__name__}: <unprintable: gateway dead>"
            rec = {
                "ok": False,
                "oracle": has_oracle,
                "rows": -1,
                "sec": round(time.monotonic() - t0, 3),
                "err": msg,
            }
        results[name] = rec
        if not rec["ok"]:
            failures.append(name)
        print(f"{'OK ' if rec['ok'] else 'FAIL'} {name} "
              f"rows={rec['rows']} {rec['sec']}s", flush=True)
        # evict cached/checkpointed blocks so queries don't interfere;
        # if the JVM died, stop sweeping (every remaining query would
        # fail for the same reason) and write what we have
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            failures.append("__jvm_died__")
            print("JVM gateway dead — aborting sweep, writing partial "
                  "results", flush=True)
            break

    out = {
        "sf_dir": args.sf_dir,
        "n_ok": sum(1 for r in results.values() if r["ok"]),
        "n_fail": len(failures),
        "failures": failures,
        "fixture_bounds": bounds,
        "total_sec": round(sum(r["sec"] for r in results.values()), 2),
        "queries": results,
    }
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in
                      ("sf_dir", "n_ok", "n_fail", "failures", "total_sec")}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
