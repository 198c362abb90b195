"""ALS fit-iteration floor evidence (round-11 verdict item 7).

q_als_recommend's cost is dominated by the MLlib ALS fit's
alternating half-iterations plus the blocked recommendForAllUsers
top-k. The only loosely-contract-preserving lever (numBlocks) changes
float summation order, which perturbs the factorization and can flip
near-tie top-3 rows — there is no reconstruction-equivalence
guarantee, so the rows-only output is NOT provably stable under it.
This tool instead documents the floor: wall time of fit(maxIter=k)
for k in {1, 2, 4, 8} plus the recommend stage, at a given SF. A
near-linear wall-vs-iterations line demonstrates the cost IS solver
iterations (not plan waste), i.e. the query sits at its §1.3 floor
for the pinned (rank=8, maxIter=8) model.

Usage: python tools/als_floor.py [sf_dir ...] > ALS_FLOOR_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="als_floor")
    out = {"profiles": []}
    for sf_dir in sf_dirs:
        events = table(spark, sf_dir, "events")
        ratings = (
            events.select(
                F.col("user_id").cast("int").alias("user"),
                F.get_json_object("props", "$.k").cast("int").alias("item"),
            )
            .filter(F.col("item").isNotNull())
            .groupBy("user", "item")
            .agg(F.log1p(F.count("*")).cast("float").alias("rating"))
            .localCheckpoint()  # isolate the fit from the input prep
        )
        n = ratings.count()
        prof = {"sf_dir": sf_dir, "n_ratings": n, "fits": {}}
        for k in (1, 2, 4, 8):
            t0 = time.time()
            model = ALS(
                rank=8, maxIter=k, seed=42, implicitPrefs=True, alpha=10.0,
                regParam=0.1, coldStartStrategy="drop", userCol="user",
                itemCol="item", ratingCol="rating",
            ).fit(ratings)
            t_fit = time.time() - t0
            t0 = time.time()
            model.recommendForAllUsers(3).write.format("noop").mode(
                "overwrite"
            ).save()
            t_rec = time.time() - t0
            prof["fits"][k] = {
                "fit_sec": round(t_fit, 2),
                "recommend_sec": round(t_rec, 2),
            }
        out["profiles"].append(prof)
        print(json.dumps(prof), file=sys.stderr, flush=True)
    out["note"] = (
        "fit wall vs maxIter at fixed rank=8; near-linear growth = the "
        "query cost is solver half-iterations (each shuffles factor "
        "blocks, never the ratings matrix) — a documented floor for "
        "the pinned model. numBlocks sweep rejected: it permutes float "
        "summation order, perturbing factors and potentially the "
        "rows-only top-3 output, with no equivalence guarantee."
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
