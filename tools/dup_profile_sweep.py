"""Duplication-profile sweep (round-8, judge item 5).

The legacy scale fixtures (tools/gen_scale.py without ``--dup-frac``)
replicate the sf0.1 corpus verbatim: 100% duplicated text, so every
dedup-family measurement is dominated by the exact-dup collapse path
(R107) and, for pair-form outputs, by m² answer writing — genuinely
unique-text behavior at scale was never measured. This sweep runs the
dedup family at matched scale on BOTH profiles:

- ``.data/sf{1,10}``   — legacy 100%-replicated text;
- ``.data/sf{1,10}u``  — ``--dup-frac 0.25``: ~25% of base docs keep
  their text verbatim in every copy (realistic boilerplate mass),
  the rest are word-perturbed per copy (disjoint shingles).

Per (profile, query): min-of-2 warm wall time over a full noop
materialization, plus the output row count (the pair forms' whole
story is output cardinality vs duplication). One JSON object at the
end; redirect to SCALING artifacts.

``--isolate`` (round-10, judge item 5) runs EVERY (profile, query)
cell in its own fresh JVM/session subprocess, so one query's
materialization (page cache, JVM heap shape, GC pressure) can never
poison the next cell's window — the round-9 artifact measured the
minhash cluster form 49.4 s in-sweep immediately after the 99 M-row
pair form vs 34.7 s standalone. Isolated numbers ARE the standalone
numbers, at the cost of one ~15 s session startup per cell (excluded
from the measurement either way).

Usage: python tools/dup_profile_sweep.py [--isolate] [dir ...]
       (default dirs: .data/sf1 .data/sf1u .data/sf10 .data/sf10u)
Run it ALONE — concurrent Spark jobs inflate wall times ~2x.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP_QUERIES = [
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_minhash_clusters",
    "q_dedup_resolve",
    "q_similarity_join",
    "q_substring_dedup",
    "q_segment_dedup_clean",
]


def _measure_one(spark, registry, d: str, q: str) -> dict:
    """min-of-2 warm noop materialization + row count for one cell."""
    fn = registry.QUERIES[q]
    runs = []
    for measured in (False, True, True):
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        if measured:
            runs.append(time.perf_counter() - t0)
    rows = fn(spark, d).count()
    return {"sec": round(min(runs), 2), "rows": rows}


def _clear_rdd_storage(spark) -> None:
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*", default=None)
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="fresh JVM per (profile, query) cell — order-insensitive",
    )
    ap.add_argument(
        "--one",
        nargs=2,
        metavar=("DIR", "QUERY"),
        help="internal: measure one cell in this process, print JSON",
    )
    args = ap.parse_args()

    if args.one:
        from stock_prediction_data_engineering_spark import registry
        from stock_prediction_data_engineering_spark.session import get_spark

        registry.load_all()
        spark = get_spark(app_name="dup-profile-one")
        d, q = args.one
        print(json.dumps(_measure_one(spark, registry, d, q)))
        spark.stop()
        return

    dirs = args.dirs or [
        ".data/sf1",
        ".data/sf1u",
        ".data/sf10",
        ".data/sf10u",
    ]

    # corpus stats need no Spark session — DuckDB over the parquet
    import duckdb

    con = duckdb.connect()
    out: dict[str, dict] = {}

    if args.isolate:
        for d in dirs:
            n, dd = con.sql(
                f"SELECT COUNT(*), COUNT(DISTINCT text) "
                f"FROM read_parquet('{d}/documents.parquet')"
            ).fetchone()
            prof = {
                "n_docs": n,
                "distinct_text": dd,
                "dup_mass": round(1 - dd / n, 4),
            }
            for q in SWEEP_QUERIES:
                print(f"[sweep-iso] {d} {q} ...", file=sys.stderr, flush=True)
                try:
                    res = subprocess.run(
                        [sys.executable, os.path.abspath(__file__), "--one", d, q],
                        capture_output=True,
                        text=True,
                        check=True,
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    )
                    prof[q] = json.loads(res.stdout.strip().splitlines()[-1])
                except Exception as exc:  # noqa: BLE001 — keep sweeping
                    tail = ""
                    if isinstance(exc, subprocess.CalledProcessError):
                        tail = (exc.stderr or "")[-160:]
                    prof[q] = {
                        "error": f"{type(exc).__name__}: {str(exc)[:120]} {tail}"
                    }
                print(f"[sweep-iso] {d} {q} = {prof[q]}", file=sys.stderr, flush=True)
            out[d] = prof
        print(json.dumps(out))
        return

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="dup-profile-sweep")
    for d in dirs:
        n, dd = con.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT text) "
            f"FROM read_parquet('{d}/documents.parquet')"
        ).fetchone()
        prof = {
            "n_docs": n,
            "distinct_text": dd,
            "dup_mass": round(1 - dd / n, 4),
        }
        for q in SWEEP_QUERIES:
            print(f"[sweep] {d} {q} ...", file=sys.stderr, flush=True)
            try:
                prof[q] = _measure_one(spark, registry, d, q)
                _clear_rdd_storage(spark)
            except Exception as exc:  # noqa: BLE001 — keep sweeping
                prof[q] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}
                _clear_rdd_storage(spark)
            print(f"[sweep] {d} {q} = {prof[q]}", file=sys.stderr, flush=True)
        out[d] = prof
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
