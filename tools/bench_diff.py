"""Diff two bench.py output files and report per-query regressions.

Usage: python tools/bench_diff.py BENCH_r03.json BENCH_r04.json [--pct 15]

Prints a table of queries whose time grew more than --pct percent
between the old and new run (plus queries added/removed), and one JSON
summary line. Exit code 1 if any regression exceeds the threshold —
wire it into the round-close routine so a perf regression is a loud
artifact, not a number nobody compares.
"""

from __future__ import annotations

import argparse
import json
import sys


def _unwrap(d: dict) -> dict:
    """Accept either bench.py's raw JSON line or the driver's wrapper
    (which nests it under "parsed")."""
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return d


def _probe_t32(d: dict) -> float | None:
    """Mean 32-thread throughput of a run's start/end cpu probes, or
    None for pre-probe artifacts."""
    p = d.get("cpu_probe")
    if not isinstance(p, dict):
        return None
    vals = [
        s["t32_meps"]
        for s in (p.get("start"), p.get("end"))
        if isinstance(s, dict) and isinstance(s.get("t32_meps"), (int, float))
    ]
    return sum(vals) / len(vals) if vals else None


def diff(old: dict, new: dict, pct: float) -> dict:
    old, new = _unwrap(old), _unwrap(new)
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    # host-drift normalization: both runs carry a fixed-kernel CPU
    # probe (bench.py cpu_probe). Query seconds scale ~inversely with
    # deliverable throughput, so a NEW time measured on a host running
    # at tp_new is rescaled to the OLD host's speed by tp_new/tp_old —
    # what remains after normalization is attributable to code.
    tp_old, tp_new = _probe_t32(old), _probe_t32(new)
    norm = (tp_new / tp_old) if tp_old and tp_new else None
    common = sorted(set(qo) & set(qn))
    regressions = []
    improvements = []
    for q in common:
        a, b = qo[q], qn[q]
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            continue
        if a <= 0:
            continue
        delta = (b - a) / a * 100
        row = {"query": q, "old_sec": a, "new_sec": b,
               "delta_pct": round(delta, 1)}
        if norm is not None:
            row["norm_delta_pct"] = round((b * norm - a) / a * 100, 1)
        # classification uses the normalized delta when probes exist
        eff = row.get("norm_delta_pct", row["delta_pct"])
        if eff > pct:
            regressions.append(row)
        elif eff < -pct:
            improvements.append(row)
    out = {
        "n_common": len(common),
        "added": sorted(set(qn) - set(qo)),
        "removed": sorted(set(qo) - set(qn)),
        "old_total_sec": round(sum(v for v in qo.values()
                                   if isinstance(v, (int, float))), 2),
        "new_total_sec": round(sum(v for v in qn.values()
                                   if isinstance(v, (int, float))), 2),
        "threshold_pct": pct,
        "regressions": sorted(
            regressions,
            key=lambda r: -r.get("norm_delta_pct", r["delta_pct"])),
        "improvements": sorted(
            improvements,
            key=lambda r: r.get("norm_delta_pct", r["delta_pct"])),
    }
    if norm is not None:
        out["cpu_probe_t32_meps"] = {
            "old": round(tp_old, 1), "new": round(tp_new, 1),
            "new_over_old": round(norm, 4),
        }
    else:
        out["cpu_probe_t32_meps"] = None  # pre-probe artifact on >=1 side
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=15.0)
    args = ap.parse_args()
    with open(args.old) as fh:
        old = json.load(fh)
    with open(args.new) as fh:
        new = json.load(fh)
    out = diff(old, new, args.pct)
    for r in out["regressions"]:
        print(f"REGRESSION {r['query']}: {r['old_sec']}s -> {r['new_sec']}s "
              f"(+{r['delta_pct']}%)", file=sys.stderr)
    print(json.dumps(out))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
