"""Interleaved A/B bench: detect real per-query regressions between
two code revisions despite host-throughput drift.

The problem (round-6 BENCHDIFF): this host's throughput drifts between
time windows (identical isolated queries measured 0.79 s vs 1.5 s
hours apart), so diffing two bench artifacts recorded in different
windows has a ±25% per-query band — too wide to detect a real 15%
regression. Probe normalization helps the totals but not the tails.

The fix is the classic A/B protocol: run FULL bench passes of both
revisions strictly alternated (A B A B A B ...) inside ONE window, so
slow host drift hits both sides equally, and compare per-query
MEDIANS across passes. With 3 passes per side the median is immune to
a single contended pass, and the within-side spread is reported next
to every ratio so a flagged query can be judged against its own
noise.

Usage:
    python tools/bench_ab.py --ref-a <git-ref> [--ref-b <git-ref>]
        [--passes 3] [--sf-dir DIR] [--out BENCHDIFF.json]

ref-b defaults to the current working tree (uncommitted code included)
— the "candidate" side. ref-a is checked out into a disposable git
worktree under .benchab/ (gitignored) and removed afterwards.

Flag rule: a query flags only when |ratio-1| > band AND the ratio
change clears both sides' own within-window spread — a wide-spread
query can't flag on noise alone.
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


def _run_pass(workdir: str, sf_dir: str, label: str, i: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    print(f"[bench_ab] pass {i} side={label} dir={workdir}", file=sys.stderr, flush=True)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py contract: stdout carries exactly one JSON line
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-a", required=True, help="baseline git ref")
    ap.add_argument(
        "--ref-b",
        default=None,
        help="candidate git ref (default: the current working tree)",
    )
    ap.add_argument("--passes", type=int, default=3, help="passes PER SIDE")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--band",
        type=float,
        default=0.10,
        help="flag threshold on |median ratio - 1|",
    )
    args = ap.parse_args()
    # a RELATIVE sf-dir resolves inside the side-a WORKTREE (where
    # gitignored fixture dirs like .data/ do not exist): every side-a
    # query then fails, bench.py swallows per-query errors into its
    # sidecar, and the whole protocol burns its passes producing empty
    # "queries" maps. Resolve once, against the caller's cwd.
    args.sf_dir = os.path.abspath(args.sf_dir)

    worktrees: list[str] = []

    def _worktree(ref: str, side: str) -> str:
        wd = os.path.join(REPO, ".benchab", f"{side}-{ref.replace('/', '_')}")
        if os.path.exists(wd):
            subprocess.run(
                ["git", "worktree", "remove", "--force", wd], cwd=REPO, check=False
            )
            shutil.rmtree(wd, ignore_errors=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", wd, ref], cwd=REPO, check=True
        )
        worktrees.append(wd)
        return wd

    dir_a = _worktree(args.ref_a, "a")
    dir_b = _worktree(args.ref_b, "b") if args.ref_b else REPO

    runs: dict[str, list[dict]] = {"a": [], "b": []}
    try:
        for i in range(args.passes):
            for side, wd in (("a", dir_a), ("b", dir_b)):
                r = _run_pass(wd, args.sf_dir, side, i)
                if not r.get("queries"):
                    # fail FAST: an all-failed pass (bad sf-dir, broken
                    # ref) would otherwise burn every remaining pass
                    # and crash on the empty-median at the end
                    raise SystemExit(
                        f"pass {i} side={side} returned zero queries "
                        f"(sf_dir={args.sf_dir}); aborting"
                    )
                runs[side].append(r)
    finally:
        for wd in worktrees:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wd], cwd=REPO, check=False
            )

    def _per_query(side: str) -> dict[str, list[float]]:
        acc: dict[str, list[float]] = {}
        for r in runs[side]:
            for q, t in r.get("queries", {}).items():
                acc.setdefault(q, []).append(t)
        return acc

    qa, qb = _per_query("a"), _per_query("b")
    common = sorted(set(qa) & set(qb))
    per_query: dict[str, dict] = {}
    flags: dict[str, dict] = {}
    for q in common:
        ma, mb = statistics.median(qa[q]), statistics.median(qb[q])
        spread_a = (max(qa[q]) - min(qa[q])) / ma if ma else 0.0
        spread_b = (max(qb[q]) - min(qb[q])) / mb if mb else 0.0
        ratio = mb / ma if ma else float("inf")
        row = {
            "a_median": round(ma, 3),
            "b_median": round(mb, 3),
            "ratio": round(ratio, 3),
            "a_runs": qa[q],
            "b_runs": qb[q],
            "a_spread": round(spread_a, 3),
            "b_spread": round(spread_b, 3),
        }
        per_query[q] = row
        # flag only when the shift clears the query's own noise floor
        if abs(ratio - 1) > max(args.band, spread_a, spread_b):
            flags[q] = row
    tot_a = sum(per_query[q]["a_median"] for q in common)
    tot_b = sum(per_query[q]["b_median"] for q in common)
    ratios = [per_query[q]["ratio"] for q in common]
    out = {
        "protocol": (
            f"interleaved A/B, {args.passes} full passes per side in one "
            "window, per-query median of per-pass min-of-2 warm runs"
        ),
        "ref_a": args.ref_a,
        "ref_b": args.ref_b or "WORKTREE",
        "sf_dir": args.sf_dir,
        "n_common": len(common),
        "total_a": round(tot_a, 3),
        "total_b": round(tot_b, 3),
        "total_ratio": round(tot_b / tot_a, 4) if tot_a else None,
        "ratio_band": {
            "p50": round(statistics.median(ratios), 3),
            "max_abs_dev": round(max(abs(r - 1) for r in ratios), 3),
        },
        "band": args.band,
        "n_flagged": len(flags),
        "flagged": flags,
        "only_a": sorted(set(qa) - set(qb)),
        "only_b": sorted(set(qb) - set(qa)),
        "per_query": per_query,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "per_query"}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
