"""Row-count accounting for the winnowing span-refinement scale story
(round-5 verdict task 8).

The max_span_len refinement (operators/winnow.py, with_spans=True)
joins the full k-gram tables of PAIRED documents. The claim to prove:
under the replication fixtures' heavy duplication (every text has
10/100 exact copies at sf1/sf10) the refinement stays PAIR-BOUNDED —
pairs are distinct-text pairs, so the k-gram join input, the surfaced
pair count, and the span wall time must all stay flat across decades
while n_docs grows 10x/100x. Only the rep-collapse groupBy touches
the duplicated rows.

Usage:
    python tools/winnow_span_accounting.py SF_DIR [SF_DIR ...]

One JSON line per sf_dir:
    {"sf_dir": ..., "n_docs": N, "n_distinct_texts": D,
     "surfaced_pairs": P, "paired_docs": Q,
     "span_join_kgram_rows": G, "pairs_sec": t1, "spans_sec": t2}

Counts reuse the operator itself (same k=24/w=8 defaults as
q_substring_dedup) so the accounting can't drift from the pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def account(spark, sf_dir: str) -> dict:
    from stock_prediction_data_engineering_spark.operators.winnow import (
        winnow_pairs,
    )

    k = 24
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    reps = docs.dropDuplicates(["text"])
    n_distinct = reps.count()

    pairs = winnow_pairs(docs).localCheckpoint()
    surfaced = pairs.count()
    paired_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    paired_docs = paired_ids.count()
    # the refinement's join input: one row per k-gram of each paired
    # rep (len - k + 1 per doc) — the quantity that must NOT grow
    # with duplication
    span_join_rows = (
        reps.join(paired_ids, reps.doc_id == paired_ids.doc_id, "semi")
        .select(
            F.greatest(
                F.length("text") - (k - 1), F.lit(0)
            ).alias("n_grams")
        )
        .agg(F.sum("n_grams"))
        .first()[0]
    )

    def timed(df_fn):
        runs = []
        for measured in (False, True, True):
            t0 = time.perf_counter()
            df_fn().write.format("noop").mode("overwrite").save()
            if measured:
                runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    pairs_sec = timed(lambda: winnow_pairs(docs))
    spans_sec = timed(lambda: winnow_pairs(docs, with_spans=True))
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_distinct_texts": n_distinct,
        "surfaced_pairs": surfaced,
        "paired_docs": paired_docs,
        "span_join_kgram_rows": int(span_join_rows or 0),
        "pairs_sec": pairs_sec,
        "spans_sec": spans_sec,
    }


def main() -> None:
    from stock_prediction_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="winnow-span-accounting")
    for sf_dir in sys.argv[1:]:
        print(json.dumps(account(spark, sf_dir)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
