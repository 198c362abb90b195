"""Exact-substring overlap detection via winnowing fingerprints.

The dedup family covers set-similarity (MinHash/SimHash/PPJoin over
shingle SETS); this operator covers the orthogonal axis the LLM-data
literature calls exact-substring dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, which uses a
suffix array): find document pairs that share a long VERBATIM
character run — copy-paste, quotation, mirrored boilerplate —
regardless of how dissimilar the rest of the texts are (a 40-char
quote inside two otherwise-unrelated documents has near-zero Jaccard
but is exactly what contamination screening must catch).

A distributed suffix array is the wrong tool on Spark (global sort
over every suffix). The public alternative is winnowing (Schleimer,
Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every
character k-gram, then keep the MINIMUM hash of every w consecutive
k-grams. The guarantee is deterministic, not probabilistic: any
shared substring of length >= k + w - 1 contains at least one full
window on both sides, and the minimum of identical windows is the
same hash — so every such pair shares a fingerprint (no false
negatives above the guarantee length). Density is ~2/(w+1) of all
k-grams, so the index is a small fraction of the corpus.

Scale shape (everything keyed or row-local):
  1. fingerprinting is PER-ROW array algebra (transform/slice/
     array_min) — embarrassingly parallel, no shuffle at all;
  2. duplicate texts are collapsed FIRST (the semantics are defined
     over distinct texts, with cluster sizes carried in the output),
     so an m-copy cluster costs one fingerprint pass, not m, and the
     pair stage never sees the C(m,2) intra-cluster blowup;
  3. fingerprint document frequencies are a keyed count, and
     fingerprints shared by more than ``df_cap`` distinct texts are
     excluded from pairing — corpus-wide boilerplate (license
     headers, templates) is a *frequency* signal, not a *pair*
     signal (q_boilerplate_ngrams measures it); the cap bounds every
     posting list, so the self-join emits at most C(df_cap, 2) pairs
     per fingerprint;
  4. the pair aggregate is keyed on (doc_a, doc_b).

No reference-repo counterpart (the reference is a 131-line ingest
DAG, reference dags/stock_data_airflow_local_aws_s3.py); this is
north-star LLM-curation surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    w: int = 8,
    df_cap: int = 50,
    with_spans: bool = False,
) -> DataFrame:
    """Pairs of DISTINCT texts sharing >= 1 winnowing fingerprint.

    Detects every pair sharing a verbatim run of >= k + w - 1 chars
    (shorter shared runs may or may not surface — standard winnowing
    semantics). Returns (doc_a, doc_b, shared_fp, dup_a, dup_b) where
    doc_a/doc_b are each text's minimum member id, doc_a < doc_b,
    shared_fp counts distinct shared fingerprints, and dup_a/dup_b
    are the exact-duplicate cluster sizes — total member-pair counts
    are derivable as dup_a * dup_b without quadratic output.

    ``with_spans=True`` adds ``max_span_len``: the length in chars of
    the longest shared verbatim run per pair (the Lee et al. ACL'22
    match-length semantics), computed EXACTLY for the surfaced pairs
    by joining their k-gram hash tables and taking the longest
    constant-offset run of consecutive matching positions (a shared
    run of length L matches L - k + 1 consecutive k-grams on one
    diagonal, so max_span_len = max run + k - 1). The refinement is
    pair-bounded: the k-gram join runs only over documents that
    already winnowed into a pair, keyed on (doc, hash) — never a
    corpus-wide product.

    Hashes are md5-derived 60-bit ints (first 15 hex digits), the
    engine-portable idiom shared with q_feature_hashing, so an ANSI
    oracle can reproduce every fingerprint bit-for-bit.

    JOIN-STRATEGY NOTE (the sf10u 1.6 GB broadcast trap): every join
    below whose build side scales with DISTINCT text carries an
    explicit ``merge`` hint. The checkpointed text table is a
    LogicalRDD that inherits the pre-checkpoint AGGREGATE's size
    estimate, which Catalyst guesses tiny; on a heavily-duplicated
    corpus that guess is accidentally right (thousands of distinct
    texts) and the planner's broadcasts are fast, but on a mostly-
    unique corpus (.data/sf10u: 377 k distinct) the same static plan
    tried to broadcast the ~200 M-row k-gram table and corpus-sized
    fingerprint sets — >1.6 GB collected to the driver, killed by
    spark.driver.maxResultSize. AQE cannot demote a statically-planned
    broadcast (it only promotes), so the strategy must be pinned where
    the size is structurally unbounded. Sort-merge spills gracefully
    at any scale; on the duplicated profile the extra sorts are over
    thousands of rows — noise.
    """
    min_len = k + w - 1
    # one representative per distinct text; carries the cluster size.
    # The groupBy shuffles text payloads once — the same cost class as
    # the ssjoin/dedup members table, and it makes every later stage
    # per-DISTINCT-text (the replication fixture's 10x duplication
    # multiplies this stage's input, not the fingerprint or pair work).
    par = docs.sparkSession.sparkContext.defaultParallelism
    m = (
        docs.filter(F.length(text_col) >= min_len)
        .repartition(par, id_col)
        .groupBy(F.col(text_col).alias("__txt"))
        .agg(
            F.min(id_col).alias("rep"),
            F.count("*").cast("bigint").alias("dup"),
        )
    )
    # per-row fingerprinting: k-gram hash array, then sliding-window
    # min. `hs` is materialized as its own projection so the window
    # lambda slices ONE array column instead of re-embedding the whole
    # md5 subtree per window (the codegen-CSE trap measured in
    # operators/ssjoin.py word_ngrams). Both arrays are guarded with
    # when(): sequence(1, x) counts DOWN for x < 1 and feeds slice a
    # zero start — and the length filter above does NOT protect these
    # expressions, because Catalyst infers a size(fps) > 0 predicate
    # from the explode below and may evaluate it on pre-filter rows
    # (observed: INVALID_PARAMETER_VALUE.START from the pushed-down
    # filter). The expressions must be total.
    empty = F.array().cast("array<bigint>")
    hs = F.when(
        F.length("__txt") >= min_len,
        F.transform(
            F.sequence(F.lit(1), F.length("__txt") - (k - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.substr(F.col("__txt"), i, F.lit(k))), 1, 15
                ),
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
    # TWO projections with a materialization barrier between them.
    # Without it, CollapseProject inlines the whole `hs` md5 transform
    # into the window lambda, and slice() re-evaluates ALL n k-gram
    # hashes for EVERY one of the n windows — O(n^2) md5 calls per
    # document on the interpreted eval path (measured: a 4-query sf1
    # sweep pinned one core for 14+ minutes; with the barrier the
    # same stage is seconds). localCheckpoint stores the hash arrays
    # executor-local (~8 bytes per character, no exchange) — the same
    # lineage-truncation trade operators/ssjoin.py documents. The
    # preceding repartition is row-honest parallelism for the CPU-
    # heavy fingerprint stage: the post-groupBy text table is
    # byte-tiny, so AQE's byte-based coalescing would otherwise run
    # the entire md5 pass on ONE core.
    mh = (
        m.repartition(par, "rep")
        .withColumn("hs", hs)
        .localCheckpoint(eager=False)
    )
    fps = mh.withColumn("fps", fp_arr).select(
        "rep", F.explode("fps").alias("fp")
    )
    # boilerplate mask: drop fingerprints present in > df_cap distinct
    # texts (keyed count + fp-keyed semi join; bounds every posting)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= df_cap)
        .select("fp")
    )
    # rare / fps scale with distinct fingerprints — never broadcast
    # (see JOIN-STRATEGY NOTE)
    fps = fps.join(rare.hint("merge"), "fp", "left_semi")
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(
            b.hint("merge"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .groupBy(
            F.col("a.rep").alias("doc_a"), F.col("b.rep").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("shared_fp"))
    )
    # read sizes off the checkpointed table so the text groupBy does
    # not re-execute for a third consumer
    sizes = mh.select("rep", "dup")
    out = (
        pairs.join(
            sizes.select(
                F.col("rep").alias("doc_a"), F.col("dup").alias("dup_a")
            ).hint("merge"),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("rep").alias("doc_b"), F.col("dup").alias("dup_b")
            ).hint("merge"),
            "doc_b",
        )
        .select("doc_a", "doc_b", "shared_fp", "dup_a", "dup_b")
    )
    if not with_spans:
        return out
    # --- exact match-length refinement (pair-bounded) ---
    # k-gram table of PAIRED docs only: positions are 1-based to match
    # the fingerprint expressions and the ANSI oracle
    from pyspark.sql.window import Window

    pair_keys = out.select("doc_a", "doc_b")
    kg = mh.select(
        "rep", F.posexplode("hs").alias("pos0", "h")
    ).select("rep", (F.col("pos0") + 1).alias("pos"), "h")
    # join strategies split by HONEST build-side bounds: pair_keys
    # (2 ids per surfaced pair) is the only side small enough to
    # hash-build, so it rides a shuffle-hash join that streams kg
    # without sorting it; a_side is pairs x positions — NOT safely
    # hash-buildable (ShuffledHashJoin cannot spill its build map:
    # observed SparkOutOfMemoryError "not enough memory to build hash
    # map" at sf10u in a loaded session) — so the big-big (doc_b, h)
    # match join is SORT-MERGE, which spills gracefully at any scale.
    # Broadcast stays forbidden throughout (frozen-stats trap above).
    a_side = kg.select(
        F.col("rep").alias("doc_a"), F.col("pos").alias("pa"), "h"
    ).join(pair_keys.hint("shuffle_hash"), "doc_a")
    matches = (
        kg.select(
            F.col("rep").alias("doc_b"), F.col("pos").alias("pb"), "h"
        )
        .join(a_side.hint("merge"), ["doc_b", "h"])
        .select("doc_a", "doc_b", "pa", "pb")
        .dropDuplicates(["doc_a", "doc_b", "pa", "pb"])
    )
    # gaps-and-islands per diagonal: a verbatim run of length L is
    # L - k + 1 consecutive (pa, pb) matches with constant pa - pb
    diag = matches.withColumn("diag", F.col("pa") - F.col("pb"))
    isl = diag.withColumn(
        "isl",
        F.col("pa")
        - F.row_number().over(
            Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
        ),
    )
    spans = (
        isl.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(F.count("*").alias("run"))
        .groupBy("doc_a", "doc_b")
        .agg((F.max("run") + (k - 1)).cast("bigint").alias("max_span_len"))
    )
    # inner join is total: a shared fingerprint IS a matching k-gram
    # (the window minimum both sides agreed on), so every surfaced
    # pair has at least one match row and a span >= k
    return out.join(spans, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "shared_fp", "dup_a", "dup_b", "max_span_len"
    )


def _fp_exprs(k: int, w: int):
    """The guarded (hs, fps) expression pair over a `__txt` column —
    shared by the standalone join and the persisted index. Guards and
    the materialization-barrier requirement are documented at the use
    site in winnow_pairs."""
    min_len = k + w - 1
    empty = F.array().cast("array<bigint>")
    hs = F.when(
        F.length("__txt") >= min_len,
        F.transform(
            F.sequence(F.lit(1), F.length("__txt") - (k - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.substr(F.col("__txt"), i, F.lit(k))), 1, 15
                ),
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
    return hs, fp_arr


def winnow_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    w: int = 8,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist a probeable exact-substring (winnowing) index:

    - ``fps/`` — (th, fp) rows partitioned by
      ``bucket = pmod(fp, n_buckets)``, ONE row set per DISTINCT text
      (keyed by content hash ``th`` — the same index-shaped
      exact-dup collapse as the MinHash index, operators/dedup.py
      minhash_index_write);
    - ``members/`` — (id, th) for output-bound member expansion.

    A probe batch collects its fingerprints' buckets and prunes the
    corpus scan to those partition directories, so re-checking a new
    batch for verbatim overlap against a standing corpus is O(batch ×
    matched buckets), never O(corpus). ``mode="append"`` admits a
    probed batch into the index (the incremental-ingest loop)."""
    min_len = k + w - 1
    par = docs.sparkSession.sparkContext.defaultParallelism
    flt = docs.filter(F.length(text_col) >= min_len)
    members = flt.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col).cast("string")).alias("th"),
    )
    reps = (
        flt.select(
            F.md5(F.col(text_col).cast("string")).alias("th"),
            F.col(text_col).alias("__txt"),
        )
        .dropDuplicates(["th"])
        .repartition(par, "th")
    )
    hs, fp_arr = _fp_exprs(k, w)
    # barrier between the two projections — see winnow_pairs
    rh = reps.withColumn("hs", hs).localCheckpoint(eager=False)
    (
        rh.withColumn("fps", fp_arr)
        .select("th", F.explode("fps").alias("fp"))
        .withColumn("bucket", F.pmod("fp", F.lit(n_buckets)))
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/fps")
    )
    members.write.mode(mode).parquet(f"{path}/members")


def winnow_index_probe(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    w: int = 8,
    n_buckets: int = 64,
    df_cap: int = 50,
    min_shared: int = 1,
) -> DataFrame:
    """Verbatim-overlap hits of ``new_docs`` against a persisted
    winnowing index (same k/w/n_buckets as the build — caller owns
    that contract). Returns (new_id, corpus_id, shared_fp).

    Scale shape (the minhash_index_probe discipline): the batch
    collapses to one representative per distinct text and its
    fingerprint table is BROADCAST; the corpus scan prunes to the
    batch's buckets (collected — at most n_buckets values); corpus-
    side boilerplate fingerprints (df > df_cap distinct texts within
    the pruned scan) are dropped before pairing, bounding every
    posting; member pairs are restored by output-bound joins through
    ``members/``. No corpus shuffle anywhere."""
    min_len = k + w - 1
    spark = new_docs.sparkSession
    flt = new_docs.filter(F.length(text_col) >= min_len)
    new_members = flt.select(
        F.col(id_col).alias("new_id"),
        F.md5(F.col(text_col).cast("string")).alias("th_n"),
    )
    new_reps = flt.select(
        F.md5(F.col(text_col).cast("string")).alias("th_n"),
        F.col(text_col).alias("__txt"),
    ).dropDuplicates(["th_n"])
    hs, fp_arr = _fp_exprs(k, w)
    new_fps = (
        new_reps.withColumn("hs", hs)
        .localCheckpoint(eager=False)
        .withColumn("fps", fp_arr)
        .select("th_n", F.explode("fps").alias("fp"))
        .withColumn("bucket", F.pmod("fp", F.lit(n_buckets)))
        .cache()
    )
    probe_buckets = [
        r.bucket for r in new_fps.select("bucket").distinct().collect()
    ]
    corpus = spark.read.parquet(f"{path}/fps").filter(
        F.col("bucket").isin(probe_buckets)
    )
    # df-cap inside the pruned scan: a fingerprint carried by > df_cap
    # distinct corpus texts is boilerplate, not an overlap signal
    rare = (
        corpus.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= df_cap)
        .select("fp")
    )
    pairs = (
        corpus.join(rare, "fp", "left_semi")
        .join(F.broadcast(new_fps.select("th_n", "fp")), "fp")
        .groupBy(F.col("th").alias("th_c"), "th_n")
        .agg(F.count("*").cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )
    # member expansion: the verified th-pair set (batch-output-bound)
    # broadcasts over a map-side scan of members/ — never a corpus
    # shuffle
    hits_th = pairs.join(F.broadcast(new_members), "th_n").select(
        "new_id", "th_c", "shared_fp"
    )
    members = spark.read.parquet(f"{path}/members")
    result = (
        members.select(
            F.col("th").alias("th_c"), F.col("id").alias("corpus_id")
        )
        .join(F.broadcast(hits_th), "th_c")
        .select("new_id", "corpus_id", "shared_fp")
        # materialize, then release the fingerprint cache — same
        # per-micro-batch cache-leak fix as minhash_index_probe
        .localCheckpoint(eager=True)
    )
    new_fps.unpersist()
    return result
