"""Compare two bench runs at different scale factors and flag
super-linear queries.

Usage: python tools/scaling_ratio.py BENCH_SMALL.json BENCH_BIG.json \
           --data-ratio 10 --flag-ratio 15 [--md SCALING_r4.md]

For each common query prints time_big / time_small; with a 10x data
ratio, a ratio above --flag-ratio (default 15, the round-3 judge's
threshold) marks the query super-linear and exits nonzero. Sub-second
small-side times are noise-prone, so queries faster than --min-sec at
the small scale are reported but never flagged.
"""

from __future__ import annotations

import argparse
import json
import sys


def _queries(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d.get("queries") or {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--flag-ratio", type=float, default=15.0)
    ap.add_argument("--min-sec", type=float, default=0.15)
    ap.add_argument("--md", default="")
    args = ap.parse_args()

    qs, qb = _queries(args.small), _queries(args.big)
    rows = []
    for q in sorted(set(qs) & set(qb)):
        a, b = qs[q], qb[q]
        if not (isinstance(a, (int, float)) and isinstance(b, (int, float))):
            continue
        ratio = b / a if a > 0 else float("inf")
        rows.append((q, a, b, ratio, a >= args.min_sec and ratio > args.flag_ratio))

    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[4]]
    lines = [
        f"| query | t(small) s | t(big) s | ratio ({args.data_ratio:g}x data) | flag |",
        "|---|---|---|---|---|",
    ]
    for q, a, b, ratio, flag in rows:
        lines.append(
            f"| {q} | {a:.3f} | {b:.3f} | {ratio:.1f}x "
            f"| {'SUPER-LINEAR' if flag else ''} |"
        )
    table = "\n".join(lines)
    print(table)
    summary = {
        "n_common": len(rows),
        "n_flagged": len(flagged),
        "flagged": [r[0] for r in flagged],
        "total_small_sec": round(sum(r[1] for r in rows), 2),
        "total_big_sec": round(sum(r[2] for r in rows), 2),
        "total_ratio": round(
            sum(r[2] for r in rows) / max(sum(r[1] for r in rows), 1e-9), 2
        ),
    }
    print(json.dumps(summary))
    if args.md:
        with open(args.md, "w") as fh:
            fh.write(
                f"# Scaling ratios: {args.small} -> {args.big} "
                f"({args.data_ratio:g}x data)\n\n"
                f"Flag threshold: >{args.flag_ratio:g}x time for "
                f"{args.data_ratio:g}x data (small-side times under "
                f"{args.min_sec}s are noise, never flagged).\n\n"
                + table
                + "\n\n```json\n" + json.dumps(summary) + "\n```\n"
            )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
