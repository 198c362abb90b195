"""Probe the q_dedup_minhash_clusters task-memory peak vs partition
width (round-9 verdict item 6).

SPILL_r9 measured max task peakExecutionMemory of ~1.2 GB on the
cluster-form minhash query at sf10u — 10x any other row in the repo.
The hypothesis: the per-pair shingle-hash arrays riding the candidate
join into the exact-verify stage make each verify partition's resident
width proportional to (pairs per partition) x (array bytes), so the
peak scales with PARTITION WIDTH, not with anything intrinsic to a
pair. If true, the peak at P shuffle partitions should scale ~1/P —
and a row-honest repartition bound on the verify input caps it on any
executor size; if instead the peak is flat in P, it is a per-task
constant (join build side, sort buffer) and a repartition would only
add an exchange.

Method: same Spark-UI REST attribution as tools/spill_audit.py, one
run of the cluster-form query per shuffle-partition setting, fresh
session each (the operator sizes its repartitions off
spark.sql.shuffle.partitions at plan time).

Usage: python tools/minhash_peak_probe.py [--sf-dir .data/sf10u]
       [--parts 8,32,128] [--out MINHASH_PEAK_r10.json]
Run ALONE — concurrent jobs shift stage attribution and peaks.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe_one(sf_dir: str, n_parts: int) -> dict:
    """One fresh-JVM measurement (subprocess target)."""
    from tools.spill_audit import audit_query

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name=f"mh-peak-{n_parts}",
        shuffle_partitions=n_parts,
        extra_conf={"spark.ui.enabled": "true"},
    )
    api = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    fn = registry.QUERIES["q_dedup_minhash_clusters"]
    rec = audit_query(spark, api, fn, sf_dir)
    rec["shuffle_partitions"] = n_parts
    spark.stop()
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".data/sf10u")
    ap.add_argument("--parts", default="8,32,128")
    ap.add_argument("--out", default="")
    ap.add_argument("--one", type=int, default=0, help="internal")
    args = ap.parse_args()

    if args.one:
        print(json.dumps(_probe_one(args.sf_dir, args.one)))
        return

    rows = []
    for p in [int(x) for x in args.parts.split(",")]:
        print(f"[peak] sf_dir={args.sf_dir} parts={p} ...",
              file=sys.stderr, flush=True)
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", args.sf_dir, "--one", str(p)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        rows.append(rec)
        print(f"[peak] parts={p} -> {rec}", file=sys.stderr, flush=True)

    # scaling read-out: peak ~ 1/P means partition-width-bound
    peaks = {r["shuffle_partitions"]: r["max_task_peak_mem_mb"] for r in rows}
    out = {
        "query": "q_dedup_minhash_clusters",
        "sf_dir": args.sf_dir,
        "runs": rows,
        "peaks_mb": peaks,
        "note": (
            "peak ~ 1/P across the parts axis => verify-input partition "
            "width bounds the peak (repartition bound applicable); flat "
            "peak => per-task constant, repartition would only add an "
            "exchange"
        ),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
