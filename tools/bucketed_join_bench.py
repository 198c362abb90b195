"""Bucketed-vs-plain fact join: the measured case for paying the
shuffle at ingest (sources/bucketed.py).

Replicates orders k-fold (key-shifted, like the relational sweep),
joins it to a k-fold lineitem slice on o_orderkey two ways — plain
parquet (both sides shuffle into a sort-merge join) and bucketed
tables (zero exchanges) — and prints warm timings plus the exchange
counts from each plan, so the claim "bucketing removes the dominant
shuffle of fact⨝fact" carries a number, not just a plan assertion
(tests/test_plan_shapes.py::test_bucketed_join_elides_shuffle).

Usage: python tools/bucketed_join_bench.py [k]   (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.session import get_spark
    from stock_prediction_data_engineering_spark.sources.bucketed import (
        cojoin,
        write_bucketed,
    )

    spark = get_spark(app_name="bucketed_bench")
    # force the sort-merge path on the plain side: broadcast would
    # dodge the comparison (and is impossible at real fact×fact scale)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def replicate(name: str, shift_col: str):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        reps = [
            base.withColumn(shift_col, F.col(shift_col) + F.lit(i * KEY_STRIDE))
            for i in range(k)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    orders = replicate("orders", "o_orderkey").select(
        F.col("o_orderkey").alias("orderkey"), "o_totalprice"
    )
    lineitem = replicate("lineitem", "l_orderkey").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )

    def agg(j):
        return j.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s"),
        )

    def warm_time(df):
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    plain_join = lineitem.join(orders, "orderkey")
    plain_plan = plain_join._jdf.queryExecution().executedPlan().toString()
    t_plain = warm_time(agg(plain_join))

    write_bucketed(orders, "bb_orders", ["orderkey"], 32, sort_cols=["orderkey"])
    write_bucketed(
        lineitem, "bb_lineitem", ["orderkey"], 32, sort_cols=["orderkey"]
    )
    bucketed_join = cojoin(spark, "bb_lineitem", "bb_orders", ["orderkey"])
    bucketed_plan = bucketed_join._jdf.queryExecution().executedPlan().toString()
    t_bucketed = warm_time(agg(bucketed_join))

    print(
        json.dumps(
            {
                "k": k,
                "plain_sec": t_plain,
                "bucketed_sec": t_bucketed,
                "speedup": round(t_plain / t_bucketed, 2),
                "plain_exchanges": plain_plan.count("Exchange hashpartitioning"),
                "bucketed_exchanges": bucketed_plan.count(
                    "Exchange hashpartitioning"
                ),
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    spark.stop()


if __name__ == "__main__":
    main()
