"""Dedup-family scaling sweep: replicate the sf0.1 documents corpus
k-fold with per-replica text mutation and measure MinHash-LSH
wall-clock and pair counts.

Replicas get distinct doc_ids and a per-replica character substitution
(vowels mapped to one replica-specific GREEK letter — a codepoint that
never occurs in the ASCII corpus, so every replica's shingle-equality
structure is exactly isomorphic to every other's), which destroys
cross-replica shingle overlap while preserving each replica's internal
near-dup structure — the TRUE pair count grows exactly k-fold
(per-replica clusters), not quadratically as naive copying would, and
the sweep measures engine scaling rather than output blowup. The 0.5
threshold is the standard near-dup operating point, where LSH recall
is sharp (P[candidate | j=0.5] = 1-(1-0.5^4)^16 ~= 0.64 per band
config, ~1.0 for j>=0.7) rather than hash-luck-dependent.

The sweep also measures the INCREMENTAL path at each k: a fixed-size
ingest batch probed against a persisted MinHash index of the k-fold
corpus (operators/dedup.py minhash_index_write/probe). The structural
claim under test: full re-dedup grows with the corpus, the probe grows
with the batch + its true hits — the gap must widen with k.

Usage: python tools/scale_sweep_dedup.py [k ...]   (default: 1 4 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replicated_docs(spark, sf_dir: str, k: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = []
    for i in range(k):
        sub = chr(0x3B1 + i)  # α, β, γ, ... — absent from the corpus
        reps.append(
            docs.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                F.translate("text", "aeiou", sub * 5).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    import tempfile

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.dedup import (
        minhash_index_probe,
        minhash_index_write,
        minhash_lsh_pairs,
    )
    from stock_prediction_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="scale_sweep_dedup")
    for k in ks:
        docs = replicated_docs(spark, sf_dir, k).localCheckpoint(eager=True)
        n_docs = docs.count()
        pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
        pairs.count()  # warm pass (codegen)
        t0 = time.perf_counter()
        n_pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5).count()
        dt = time.perf_counter() - t0

        # incremental path: fixed ~2%-of-base batch vs persisted index
        batch = docs.filter(F.col("doc_id") % (50 * k) == 0)
        corpus = docs.filter(F.col("doc_id") % (50 * k) != 0)
        path = tempfile.mkdtemp(prefix=f"mh_sweep_{k}_") + "/idx"
        t0 = time.perf_counter()
        minhash_index_write(corpus, path)
        t_build = time.perf_counter() - t0
        minhash_index_probe(batch, path, jaccard_threshold=0.5).count()  # warm
        t0 = time.perf_counter()
        n_hits = minhash_index_probe(batch, path, jaccard_threshold=0.5).count()
        t_probe = time.perf_counter() - t0

        # exact prefix-filter similarity join (operators/ssjoin.py) on
        # the same mutated corpus: the no-false-negative path, measured
        # against the approximate LSH pipeline at every k
        from stock_prediction_data_engineering_spark.operators.ssjoin import (
            jaccard_similarity_join,
        )

        jaccard_similarity_join(docs).count()  # warm
        t0 = time.perf_counter()
        n_exact = jaccard_similarity_join(docs).count()
        t_exact = time.perf_counter() - t0
        print(
            f"k={k:3d} docs={n_docs:7d} pairs={n_pairs:8d} "
            f"warm_sec={dt:7.2f} | incremental: build={t_build:6.2f}s "
            f"probe={t_probe:6.2f}s hits={n_hits:6d} "
            f"full/probe={dt / t_probe:5.1f}x | exact ssjoin: "
            f"{t_exact:7.2f}s pairs={n_exact:8d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
