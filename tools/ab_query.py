"""Focused interleaved A/B for a FEW queries: same protocol as
tools/bench_ab.py (strictly alternated passes inside one window, so
host drift hits both sides equally; per-query min + all runs reported)
but scoped to named queries, so a single-operator change can be
adjudicated at sf10 without paying 6 full 62-query bench passes.

Each pass is a fresh JVM subprocess (one per side per round) that runs
the named queries with the bench's own methodology: pass 0 untimed
(codegen), then 2 timed noop-sink runs, min recorded.

Usage:
    python tools/ab_query.py --queries q_x[,q_y] --ref-a <git-ref>
        [--passes 3] [--sf-dir DIR] [--out AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from stock_prediction_data_engineering_spark import registry
from stock_prediction_data_engineering_spark.session import get_spark

names = sys.argv[1].split(",")
sf_dir = sys.argv[2]
registry.load_all()
spark = get_spark(app_name="ab_query")
from stock_prediction_data_engineering_spark.catalog import TABLES, table
for t in TABLES:
    try:
        table(spark, sf_dir, t).count()
    except Exception:
        pass
out = {}
for name in names:
    fn = registry.QUERIES[name]
    runs = []
    for measured in (False, True, True):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        if measured:
            runs.append(round(time.perf_counter() - t0, 3))
    out[name] = runs
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def _run_pass(workdir: str, queries: str, sf_dir: str, label: str, i: int) -> dict:
    print(f"[ab_query] pass {i} side={label}", file=sys.stderr, flush=True)
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET, queries, sf_dir],
        cwd=workdir,
        capture_output=True,
        text=True,
    )
    # surface the subprocess's own diagnostics on any failure mode: a
    # non-zero exit OR a missing result marker would otherwise kill a
    # multi-hour run with no context (advisor r10 item 1)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("ABRESULT ")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stderr[-8000:])
        raise RuntimeError(
            f"A/B pass {i} side={label} failed: rc={proc.returncode}, "
            f"ABRESULT marker {'missing' if not lines else 'present'}; "
            f"stderr tail above, stdout tail: {proc.stdout[-1000:]!r}"
        )
    return json.loads(lines[-1][len("ABRESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--ref-a", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    wt = os.path.join(REPO, ".benchab", "abq_a")
    if os.path.isdir(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)
    os.makedirs(os.path.dirname(wt), exist_ok=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, args.ref_a],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        a_runs: list[dict] = []
        b_runs: list[dict] = []
        for i in range(args.passes):
            a_runs.append(_run_pass(wt, args.queries, args.sf_dir, "A", i))
            b_runs.append(_run_pass(REPO, args.queries, args.sf_dir, "B", i))
        result = {
            "protocol": (
                f"interleaved A/B, {args.passes} fresh-JVM passes/side, "
                "per-pass min of 2 timed noop-sink runs (pass 0 codegen)"
            ),
            "ref_a": args.ref_a,
            "sf_dir": args.sf_dir,
            "queries": {},
        }
        for q in args.queries.split(","):
            amins = [min(r[q]) for r in a_runs]
            bmins = [min(r[q]) for r in b_runs]
            med_a = statistics.median(amins)
            med_b = statistics.median(bmins)
            result["queries"][q] = {
                "a_pass_mins": amins,
                "b_pass_mins": bmins,
                "a_all_runs": [r[q] for r in a_runs],
                "b_all_runs": [r[q] for r in b_runs],
                "median_a": med_a,
                "median_b": med_b,
                "ratio_b_over_a": round(med_b / med_a, 3) if med_a else None,
            }
        text = json.dumps(result, indent=1)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(text + "\n")
        print(text)
    finally:
        # remove only THIS tool's worktree — .benchab/ is shared with
        # tools/bench_ab.py, whose live worktrees a full-tree rmtree
        # would delete mid-bench (advisor r10 item 2)
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
