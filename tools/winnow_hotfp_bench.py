"""Hot-fingerprint fixture for winnow's df_count_mode (round-11
verdict item 9): synthesize a corpus where a single boilerplate run is
shared by EVERY document (the unstripped license/navigation-header
case the preagg mode was built for), then measure window vs preagg
interleaved in one session.

The fixture: n_docs distinct documents, each = one shared 64-char
boilerplate prefix + a unique pseudo-random tail. At k=24/w=8 the
boilerplate contributes fingerprints with document frequency = n_docs
(corpus-hot); the window mode routes all their (rep, fp) rows through
single window tasks (spillable buffer, serialized), while preagg
partially aggregates their counts map-side before anything wide
crosses the wire. Both modes drop the hot fps at the df cap; answers
are identical (equivalence pinned in tests/test_winnow.py).

Usage: python tools/winnow_hotfp_bench.py [n_docs] [rounds] > WINNOW_HOTFP_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.winnow import (
        winnow_pairs,
    )
    from stock_prediction_data_engineering_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="winnow_hotfp")

    boiler = "SHARED LICENSE HEADER do not remove this notice ever AT ALL. "
    assert len(boiler) >= 31  # >= k + w - 1: guaranteed shared fps
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler),
            # unique tail long enough to fingerprint: 8 hash words
            F.concat_ws(
                " ",
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{i}")))
                    for i in range(8)
                ],
            ),
        ).alias("text"),
    ).localCheckpoint()  # freeze the fixture out of the timed region
    n = docs.count()

    out = {"n_docs": n, "boiler_chars": len(boiler), "runs": {"window": [], "preagg": []}}
    counts = {}
    for r in range(rounds):
        for mode in ("window", "preagg"):
            t0 = time.time()
            res = winnow_pairs(docs, df_count_mode=mode)
            res.write.format("noop").mode("overwrite").save()
            out["runs"][mode].append(round(time.time() - t0, 2))
        print(f"round {r}: {out['runs']}", file=sys.stderr, flush=True)
    # answers identical (small outputs here: hot fps are df-capped away)
    for mode in ("window", "preagg"):
        counts[mode] = winnow_pairs(docs, df_count_mode=mode).count()
    out["pair_counts"] = counts
    out["counts_equal"] = counts["window"] == counts["preagg"]
    out["protocol"] = (
        "interleaved same-session rounds, noop sink; fixture frozen by "
        "an eager localCheckpoint before timing"
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
