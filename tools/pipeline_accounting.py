"""End-to-end corpus-admission pipeline accounting (round-7 task 6):
the composed-system twin of the per-operator scale accounting.

Chains the SAME stage functions streaming/ingest.py's admission loop
composes — quality gate → within-batch MinHash resolve → persisted
MinHash index probe → winnowing substring-index probe → sequence pack
→ snapshot publish + index appends — over N document batches, and
records per (batch, stage): rows in, rows dropped/out, wall seconds,
and shuffle write MB (Spark REST stage diff, the spill_audit.py
protocol). The artifact answers the question no per-operator bench
does: what does a full ingest batch COST, stage by stage, and does
per-batch cost stay O(batch) as the corpus (and its indexes) grow
batch over batch.

Closing invariants on the final lake (asserted, recorded):
- admitted lake is near-dup-free at the admission threshold,
- every gate-passing doc that is BOTH MinHash-isolated and
  verbatim-isolated was admitted (order-independent must-admit set),
- admitted ids ⊆ input ids and lake rows == sum of per-batch admits,
- pack capacity respected: every pack_offset < capacity.

Usage:
    python tools/pipeline_accounting.py [--sf-dir DIR] [--batches N]
        [--out PIPELINE.json] [--work DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 1024 * 1024
JACCARD = 0.7
PACK_CAPACITY = 2048


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


class StageMeter:
    """Times a stage and attributes its Spark stages via id-diff."""

    def __init__(self, api: str):
        self.api = api

    def run(self, fn):
        before = {s["stageId"] for s in _get(f"{self.api}/stages")}
        t0 = time.perf_counter()
        out = fn()
        sec = time.perf_counter() - t0
        stages = [
            s
            for s in _get(f"{self.api}/stages?status=complete")
            if s["stageId"] not in before
        ]
        return out, {
            "sec": round(sec, 3),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / MB, 2
            ),
            "n_stages": len(stages),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.data/sf10")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--out", default="")
    ap.add_argument("--work", default="/tmp/pipeline_accounting")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.operators.dedup import (
        minhash_index_probe,
        minhash_index_write,
        minhash_lsh_pairs,
        resolve_duplicates,
    )
    from stock_prediction_data_engineering_spark.operators.winnow import (
        winnow_index_probe,
        winnow_index_write,
    )
    from stock_prediction_data_engineering_spark.queries.llm_curation import (
        quality_scorecard,
    )
    from stock_prediction_data_engineering_spark.queries.llm_pipeline import (
        pack_assignment,
    )
    from stock_prediction_data_engineering_spark.session import get_spark
    from stock_prediction_data_engineering_spark.sources.snapshots import (
        snapshot_read,
        snapshot_write,
    )

    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work)
    index_path = f"{args.work}/minhash_index"
    sub_index_path = f"{args.work}/substring_index"
    lake_path = f"{args.work}/lake"

    spark = get_spark(
        app_name="pipeline-accounting",
        extra_conf={"spark.ui.enabled": "true"},
    )
    api = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    meter = StageMeter(api)

    docs = table(spark, args.sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    n_input = docs.count()
    batches_acct: list[dict] = []
    total_admitted = 0

    for b in range(args.batches):
        batch = docs.filter(F.pmod("doc_id", F.lit(args.batches)) == b)
        # materialize the batch once so stage timings measure the
        # stage, not a re-scan of the input. Row-honest repartition
        # first: duplicated text compresses ~100:1 in parquet, so the
        # byte-based scan split reads a 125k-row batch as 2-3
        # partitions and every downstream map stage would run 3-way
        # on 32 cores (the q_dsir_select trap, memory:
        # spark-expression-traps #3)
        batch = batch.repartition(
            spark.sparkContext.defaultParallelism
        ).localCheckpoint(eager=True)
        rows_in = batch.count()
        acct: dict = {"batch": b, "rows_in": rows_in, "stages": {}}

        # 1) quality gate (Gopher/C4 rule family, shared with
        #    q_quality_rules)
        def _quality():
            keep = quality_scorecard(batch).filter("passes").select("doc_id")
            return batch.join(keep, "doc_id", "semi").localCheckpoint(
                eager=True
            )

        survivors, m = meter.run(_quality)
        n = survivors.count()
        acct["stages"]["quality_gate"] = {
            **m,
            "rows_out": n,
            "dropped": rows_in - n,
        }
        prev = n

        # 2) within-batch near-dup resolve (MinHash pairs + connected
        #    components, canonical survivor per cluster)
        def _within():
            pairs = minhash_lsh_pairs(
                survivors, jaccard_threshold=JACCARD
            )
            return (
                resolve_duplicates(survivors, pairs)
                .filter("is_canonical")
                .select(survivors.columns)
                .localCheckpoint(eager=True)
            )

        survivors, m = meter.run(_within)
        n = survivors.count()
        acct["stages"]["within_batch_dedup"] = {
            **m,
            "rows_out": n,
            "dropped": prev - n,
        }
        prev = n

        # 3) cross-batch near-dup: probe the persisted MinHash index
        if os.path.isdir(f"{index_path}/bands"):

            def _probe():
                hits = (
                    minhash_index_probe(
                        survivors, index_path, jaccard_threshold=JACCARD
                    )
                    .select(F.col("new_id").alias("doc_id"))
                    .distinct()
                )
                return survivors.join(
                    hits, "doc_id", "left_anti"
                ).localCheckpoint(eager=True)

            survivors, m = meter.run(_probe)
            n = survivors.count()
            acct["stages"]["index_probe_neardup"] = {
                **m,
                "rows_out": n,
                "dropped": prev - n,
            }
            prev = n

        # 4) cross-batch verbatim screen: winnowing substring index
        if os.path.isdir(f"{sub_index_path}/fps"):

            def _screen():
                hits = (
                    winnow_index_probe(survivors, sub_index_path)
                    .select(F.col("new_id").alias("doc_id"))
                    .distinct()
                )
                return survivors.join(
                    hits, "doc_id", "left_anti"
                ).localCheckpoint(eager=True)

            survivors, m = meter.run(_screen)
            n = survivors.count()
            acct["stages"]["index_probe_substring"] = {
                **m,
                "rows_out": n,
                "dropped": prev - n,
            }
            prev = n

        # 5) sequence pack (concat-and-chunk per source)
        def _pack():
            toks = survivors.withColumn(
                "n_tokens", F.size(F.split("text", " "))
            )
            return pack_assignment(
                toks, "source", "doc_id", "n_tokens", PACK_CAPACITY
            ).localCheckpoint(eager=True)

        packed, m = meter.run(_pack)
        n_packs = packed.select("source", "pack_id").distinct().count()
        acct["stages"]["sequence_pack"] = {**m, "rows_out": prev, "n_packs": n_packs}

        # 6) publish: snapshot-atomic lake append + both index appends
        def _publish():
            snapshot_write(packed, lake_path, mode="append")
            minhash_index_write(survivors, index_path, mode="append")
            winnow_index_write(survivors, sub_index_path, mode="append")
            return None

        _, m = meter.run(_publish)
        acct["stages"]["publish_lake_and_indexes"] = {**m, "rows_out": prev}
        acct["admitted"] = prev
        total_admitted += prev
        acct["batch_sec"] = round(
            sum(s["sec"] for s in acct["stages"].values()), 3
        )
        batches_acct.append(acct)
        print(json.dumps(acct), flush=True)

    # ---- closing invariants on the final lake ----
    # must-admit set: gate-passing docs that are BOTH MinHash-isolated
    # and verbatim-isolated among gate-passing docs — no stage of the
    # loop may ever drop one, regardless of batch arrival order (the
    # same guarantee tests/test_streaming.py pins for the 2-axis loop)
    from stock_prediction_data_engineering_spark.operators.winnow import (
        winnow_pairs,
    )

    lake = snapshot_read(spark, lake_path)
    lake_rows = lake.count()
    residual_pairs = minhash_lsh_pairs(
        lake.select("doc_id", "text"), jaccard_threshold=JACCARD
    ).count()
    gated = (
        docs.join(
            quality_scorecard(docs).filter("passes").select("doc_id"),
            "doc_id",
            "semi",
        )
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    gate_pass = {r.doc_id for r in gated.select("doc_id").collect()}
    global_pairs = minhash_lsh_pairs(gated, jaccard_threshold=JACCARD)
    comp = resolve_duplicates(gated, global_pairs)
    singles = comp.groupBy("component").count().filter("count = 1")
    singleton_ids = {
        r.doc_id
        for r in comp.join(singles, "component").select("doc_id").collect()
    }
    # verbatim axis: expand winnow pairs (canonical per distinct text)
    # back to every member doc via text equality
    wp = winnow_pairs(gated)
    pair_ids = (
        wp.select(F.col("doc_a").alias("doc_id"))
        .union(wp.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    pair_texts = gated.join(pair_ids, "doc_id", "semi").select("text")
    overlapped = {
        r.doc_id
        for r in gated.join(
            pair_texts.distinct(), "text", "semi"
        ).select("doc_id").collect()
    }
    admitted_ids = {r.doc_id for r in lake.select("doc_id").collect()}
    input_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    missing_singletons = (singleton_ids - overlapped) - admitted_ids
    max_offset = lake.agg(F.max("pack_offset")).first()[0]
    invariants = {
        "lake_rows": lake_rows,
        "sum_admitted": total_admitted,
        "lake_equals_sum_admitted": lake_rows == total_admitted,
        "residual_neardup_pairs": residual_pairs,
        "lake_neardup_free": residual_pairs == 0,
        "n_gate_pass": len(gate_pass),
        "missing_isolated_singletons": len(missing_singletons),
        "all_singletons_admitted": not missing_singletons,
        "admitted_subset_of_input": admitted_ids <= input_ids,
        "pack_capacity": PACK_CAPACITY,
        "max_pack_offset": max_offset,
        "pack_capacity_respected": (max_offset or 0) < PACK_CAPACITY,
    }
    ok = all(
        invariants[k]
        for k in (
            "lake_equals_sum_admitted",
            "lake_neardup_free",
            "all_singletons_admitted",
            "admitted_subset_of_input",
            "pack_capacity_respected",
        )
    )
    out = {
        "sf_dir": args.sf_dir,
        "n_batches": args.batches,
        "n_input": n_input,
        "total_admitted": total_admitted,
        "admission_rate": round(total_admitted / n_input, 4) if n_input else None,
        "batches": batches_acct,
        "invariants": invariants,
        "invariants_ok": ok,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
