"""Experiment: decompose the minhash verify-stage cost at a fixture.

Times (a) the verify joins WITHOUT the intersect (sizes only), (b) the
full intersect verify as shipped, (c) intersect with (id_a, id_b)
repartition instead of id_a alone (skew probe), (d) the packed-UB
prefilter engaged at the low threshold. Diagnostic only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators import dedup
    from stock_prediction_data_engineering_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".data/sf10u"
    thr = 0.2
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = dedup._spread(docs)
    members = d.select(
        F.col("doc_id").alias("id"), F.md5(F.col("text").cast("string")).alias("__th")
    )
    reps = members.groupBy("__th").agg(F.min("id").alias("id"))
    d2 = d.join(
        reps.select(F.col("id").alias("__rep_id")),
        F.col("doc_id") == F.col("__rep_id"),
        "left_semi",
    )
    base = d2.select(
        F.col("doc_id").alias("id"),
        dedup.hashed_shingle_set("text", 5).alias("sh_hashes"),
    ).localCheckpoint(eager=False)
    sp = (
        base.select(
            "id",
            F.size("sh_hashes").alias("n"),
            dedup.minhash_signature_packed_np(64)(F.col("sh_hashes")).alias("sp"),
        )
        .select("id", "n", F.col("sp.sig").alias("sig"), F.col("sp.packed").alias("packed"))
        .localCheckpoint(eager=False)
    )
    banded = dedup._band_table(sp, 16, 4, extra=("n",)).localCheckpoint(eager=False)
    left, right = banded.alias("l"), banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id"))
            & (
                F.least("l.n", "r.n").cast("double")
                >= (thr - 5e-5) * F.greatest("l.n", "r.n")
            ),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.n").alias("n_a"),
            F.col("r.n").alias("n_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .repartition(n_parts, "id_a")
        .localCheckpoint(eager=True)
    )
    n_c = cands.count()
    print(f"candidates materialized: n={n_c}")

    # skew probe: top id_a fan-outs
    top = (
        cands.groupBy("id_a").count().orderBy(F.desc("count")).limit(5).collect()
    )
    print("top id_a fanouts:", [(r.id_a, r["count"]) for r in top])

    ha = base.select(F.col("id").alias("id_a"), F.col("sh_hashes").alias("h_a"))
    hb = base.select(F.col("id").alias("id_b"), F.col("sh_hashes").alias("h_b"))

    t0 = time.time()
    j = cands.join(ha, "id_a").join(hb, "id_b")
    j.agg(F.sum(F.size("h_a") + F.size("h_b"))).collect()
    t1 = time.time()
    print(f"(a) joins only (sizes):        {t1-t0:.1f}s")

    inter = F.size(F.array_intersect("h_a", "h_b"))
    jacc = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    j.withColumn("jaccard", F.round(jacc, 4)).filter(
        F.col("jaccard") >= thr
    ).agg(F.count("*"), F.sum("jaccard")).collect()
    t2 = time.time()
    print(f"(b) shipped verify:            {t2-t1:.1f}s")

    c2 = cands.repartition(n_parts * 4, "id_a", "id_b")
    j2 = c2.join(ha, "id_a").join(hb, "id_b")
    j2.withColumn("jaccard", F.round(jacc, 4)).filter(
        F.col("jaccard") >= thr
    ).agg(F.count("*"), F.sum("jaccard")).collect()
    t3 = time.time()
    print(f"(c) (id_a,id_b)x4 repartition: {t3-t2:.1f}s")

    # (d) packed UB prefilter at thr=0.2
    pk = sp.select("id", "packed")
    cp = (
        cands.join(
            pk.select(F.col("id").alias("id_a"), F.col("packed").alias("pk_a")).hint("merge"),
            "id_a",
        ).join(
            pk.select(F.col("id").alias("id_b"), F.col("packed").alias("pk_b")).hint("merge"),
            "id_b",
        )
    )
    ub = dedup._packed_intersect_ub(F.col("pk_a"), F.col("pk_b"))
    kept = cp.filter(
        F.col("pk_a").isNull()
        | F.col("pk_b").isNull()
        | (ub.cast("double") >= (thr - 5e-5) * (F.col("n_a") + F.col("n_b") - ub))
    )
    nk = kept.count()
    t4 = time.time()
    print(f"(d) packed UB @0.2: kept {nk}/{n_c} in {t4-t3:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
