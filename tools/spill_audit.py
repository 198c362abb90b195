"""Spill / peak-memory audit for the window-heavy finance family.

SCALING_r4.md flagged decade-2 ratios of 5-6x for q_bollinger_bands,
q_cumulative_sum, q_rsi and q_window_range_frame (keyed windows over
per-key sorts) and hypothesized local[32] sort-spill saturation rather
than plan cliffs. This tool makes that falsifiable: it runs each query
with the Spark UI enabled and pulls the per-stage executor metrics the
UI listener aggregates — memory/disk bytes spilled, shuffle read/write
volume, and the max task peakExecutionMemory — from the REST API,
attributing stages to queries by diffing stage ids around each run.

Usage:
    python tools/spill_audit.py SF_DIR [SF_DIR ...] [--queries a,b,c]

One JSON line per (sf_dir, query):
    {"sf_dir": ..., "query": ..., "sec": t,
     "memory_spill_mb": m, "disk_spill_mb": d,
     "shuffle_write_mb": w, "shuffle_read_mb": r,
     "max_task_peak_mem_mb": p, "n_stages": k}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_bollinger_bands",
    "q_cumulative_sum",
    "q_rsi",
    "q_window_range_frame",
]

MB = 1024 * 1024


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def audit_query(spark, api: str, fn, sf_dir: str) -> dict:
    # warmup pass first, THEN snapshot stage ids: the attributed
    # metrics must describe the same single execution `sec` times,
    # not warmup+measured summed (double-counted spill otherwise)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    before = {s["stageId"] for s in _get(f"{api}/stages")}
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = [time.perf_counter() - t0]
    stages = [
        s
        for s in _get(f"{api}/stages?status=complete")
        if s["stageId"] not in before
    ]
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    # max task peak execution memory across this query's heaviest
    # stages (sort/agg state): task-level distribution needs the
    # detail endpoint, so only the top few stages by duration are hit
    peak = 0.0
    heavy = sorted(
        stages, key=lambda s: s.get("executorRunTime", 0), reverse=True
    )[:4]
    for s in heavy:
        det = _get(
            f"{api}/stages/{s['stageId']}/{s['attemptId']}"
            "?details=false&withSummaries=true"
        )
        dist = (det.get("taskMetricsDistributions") or {}).get(
            "peakExecutionMemory"
        )
        if dist:
            peak = max(peak, dist[-1])  # last quantile = max
    return {
        "sec": round(min(runs), 3),
        "memory_spill_mb": round(mem_spill / MB, 1),
        "disk_spill_mb": round(disk_spill / MB, 1),
        "shuffle_write_mb": round(sh_w / MB, 1),
        "shuffle_read_mb": round(sh_r / MB, 1),
        "max_task_peak_mem_mb": round(peak / MB, 1),
        "n_stages": len(stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="+")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name="spill-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    api = f"{ui}/api/v1/applications/{app_id}"

    for sf_dir in args.sf_dirs:
        for name in args.queries.split(","):
            fn = registry.QUERIES[name]
            row = {"sf_dir": sf_dir, "query": name}
            row.update(audit_query(spark, api, fn, sf_dir))
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
