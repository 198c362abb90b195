"""Merge the chunked sf10 sweep artifacts (SWEEP_r10_sf10_bNN.json)
into SWEEP_r10_sf10.json, recording an exact deferral reason for any
query whose chunk did not run inside the round's wall budget.

The chunking exists because the full 225-query value sweep at sf10 is
DuckDB-oracle-bound (single rows measured at 690 s) and a monolithic
run risks losing everything to one OOM/deadline; chunks are
priority-ordered (the round-9 verdict's exact-arithmetic families
first, the documents-heavy oracle family last).
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")
from stock_prediction_data_engineering_spark import registry  # noqa: E402

registry.load_all()
all_names = sorted(registry.QUERIES.keys())

merged: dict = {}
chunks = sorted(glob.glob("SWEEP_r10_sf10_b*.json"))
total = 0.0
bounds = None
for path in chunks:
    d = json.load(open(path))
    merged.update(d.get("queries", {}))
    total += d.get("total_sec", 0.0)
    bounds = d.get("fixture_bounds", bounds)

unswept = [n for n in all_names if n not in merged]
n_ok_val = sum(1 for r in merged.values() if r.get("ok") and r.get("oracle"))
n_ok = sum(1 for r in merged.values() if r.get("ok"))
n_fail = sum(1 for r in merged.values() if not r.get("ok"))
out = {
    "sf_dir": ".data/sf10",
    "n_queries_swept": len(merged),
    "n_ok": n_ok,
    "n_ok_value_compared": n_ok_val,
    "n_fail": n_fail,
    "failures": [n for n, r in merged.items() if not r.get("ok")],
    "fixture_bounds": bounds,
    "total_sec": round(total, 1),
    "chunks": chunks,
    "queries": merged,
    "unswept": {
        n: (
            "deferred to optimization round 2: sf10 DuckDB-oracle wall "
            "budget (single oracle rows measured at 690 s; chunks are "
            "priority-ordered, this query's chunk fell past the round's "
            "deadline); exec-only coverage at sf10 in SWEEP_r8_sf10_exec, "
            "value-exact at sf1 in SWEEP_r10_sf1"
        )
        for n in unswept
    },
}
json.dump(out, open("SWEEP_r10_sf10.json", "w"), indent=1)
print(
    f"merged {len(chunks)} chunks: swept={len(merged)} ok={n_ok} "
    f"value_compared={n_ok_val} fail={n_fail} unswept={len(unswept)}"
)
