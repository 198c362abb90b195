"""One-off stage-split profiler for winnow_pairs at a given fixture.

Times (warm, one measured run each after a warm-up scan):
  fp_explode   — distinct-text collapse + fingerprint + explode (count)
  pairs_only   — winnow_pairs(with_spans=False) noop write
  full_spans   — winnow_pairs(with_spans=True)  noop write
Usage: python tools/winnow_profile.py [dir]   (default .data/sf10u)
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

    d = sys.argv[1] if len(sys.argv) > 1 else ".data/sf10u"
    spark = get_spark(app_name="winnow-profile")
    docs = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()  # warm the scan
    out: dict[str, float] = {}

    # stage a: fingerprints only (replicate the operator's front half)
    k, w = 24, 8
    par = spark.sparkContext.defaultParallelism
    m = (
        docs.filter(F.length("text") >= k + w - 1)
        .repartition(par, "doc_id")
        .groupBy(F.col("text").alias("__txt"))
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("dup"))
    )
    empty = F.array().cast("array<bigint>")
    hs = F.when(
        F.length("__txt") >= k + w - 1,
        F.transform(
            F.sequence(F.lit(1), F.length("__txt") - (k - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.substr(F.col("__txt"), i, F.lit(k))), 1, 15),
                16,
                10,
            ).cast("bigint"),
        ),
    ).otherwise(empty)
    fp_arr = F.when(
        F.size("hs") >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("hs") - (w - 1)),
                lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
            )
        ),
    ).otherwise(empty)
    t0 = time.perf_counter()
    mh = m.repartition(par, "rep").withColumn("hs", hs).localCheckpoint(
        eager=False
    )
    fps = mh.withColumn("fps", fp_arr).select(
        "rep", F.explode("fps").alias("fp")
    )
    n_fps = fps.count()
    out["fp_explode_sec"] = round(time.perf_counter() - t0, 2)
    out["n_fps"] = n_fps
    t0 = time.perf_counter()
    n_kg = mh.select("rep", F.explode("hs").alias("h")).count()
    out["kg_count_sec"] = round(time.perf_counter() - t0, 2)
    out["n_kg"] = n_kg

    t0 = time.perf_counter()
    winnow_pairs(docs, with_spans=False).write.format("noop").mode(
        "overwrite"
    ).save()
    out["pairs_only_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    winnow_pairs(docs, with_spans=True).write.format("noop").mode(
        "overwrite"
    ).save()
    out["full_spans_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
