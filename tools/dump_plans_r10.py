"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Used for the round-10 before/after plan evidence: run once from the
round-9-close worktree with --suffix before, once from HEAD with
--suffix after.

Usage: python tools/dump_plans_r10.py --queries q_a,q_b --suffix after
           [--sf-dir /root/testdata/sf0.1] [--out-dir plans/r10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    # round 11: suffix may carry a scale tag (e.g. after_sf10u) so the
    # measured-gate branches can be evidenced at the scale where they
    # flip, not just at sf0.1
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r10")
    args = ap.parse_args()

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="plan_dump_r10")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries.split(","):
        name = name.strip()
        fn = registry.QUERIES[name]
        df = fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
