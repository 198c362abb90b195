"""Persisted inverted-index full-text search with BM25 ranking.

Completes the persisted-index family (MinHash bands for near-dup
probes, IVF cells / LSH buckets for vectors — operators/dedup.py,
operators/similarity.py) with the text retrieval structure: token
posting lists, bucket-partitioned so a query touches only its terms'
partition directories.

Why this shape at 100 TB: scoring a keyword query by scanning the
corpus is O(corpus) per query. The inverted index makes it
O(Σ posting lengths of the query terms): postings are laid out
partitioned by ``bucket = pmod(xxhash64(token), n_buckets)``, the
query's buckets are known driver-side (a handful of ints), so the
scan statically prunes to those directories; document length is
DENORMALIZED into each posting row (classic search-engine layout) so
scoring joins nothing but the tiny per-term stats table.

BM25 uses libm log, so scores are engine-internal (rows-only in the
registry); ranking correctness is pinned by tests against a pure-
python reference scorer instead of a SQL oracle.

No reference-repo counterpart (the reference is a 131-line ingest
DAG); north-star LLM-curation surface (BASELINE.json).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(text_col), r"[^a-z0-9]+"),
                lambda w: w != F.lit(""),
            )
        ).alias("tok"),
    )


def search_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    expire_keep_last: int | None = None,
) -> None:
    """Build the index under ``path``:

    - ``postings/`` — (tok, id, tf, dl) partitioned by token bucket;
      ``dl`` (document length) is denormalized so BM25 needs no
      doc-length join at query time;
    - ``terms/``    — (tok, df) per-token document frequency, same
      bucket partitioning (pruned alongside postings);
    - ``meta.json`` — corpus size N and average doc length, the two
      scalars BM25 needs (driver-side, O(1)).

    Publish is ATOMIC: postings/terms/meta are staged into a fresh
    ``build-*`` directory and go live by one ``os.replace`` of the
    ``CURRENT`` pointer file (the snapshot-manifest pattern from
    sources/snapshots.py). A crash mid-rebuild leaves the previous
    build live; a concurrent reader resolves CURRENT once and reads
    one self-consistent build — never new postings with stale meta.

    Superseded builds are KEPT by default (Spark reads are lazy: a
    reader that resolved CURRENT before this rebuild may execute its
    DataFrame after it, against the old build's files) — a long-lived
    rebuild loop that never reclaims accumulates one ``build-*`` dir
    per rebuild. Either call :func:`search_index_expire` as a separate
    step once no reader can still hold old builds, or pass
    ``expire_keep_last=N`` to run that same expire inline after
    publish (opt-in: only safe when the caller KNOWS reader lifetimes
    are shorter than N rebuild intervals).
    """
    os.makedirs(path, exist_ok=True)
    # atomic mkdir claim: concurrent rebuilder threads share the pid,
    # so an exists-check would race two builders into one dir
    attempt = 0
    while True:
        build = os.path.join(path, f"build-{os.getpid():05d}-{attempt:03d}")
        try:
            os.mkdir(build)
            break
        except FileExistsError:
            attempt += 1

    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    postings = tf.join(dl, "id").withColumn(
        "bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets))
    )
    (
        postings.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{build}/postings")
    )
    terms = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    )
    (
        terms.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{build}/terms")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ).collect()[0]
    with open(f"{build}/meta.json", "w") as fh:
        json.dump(
            {
                "n_docs": stats["n_docs"],
                # SUM over zero rows is NULL — coalesce so an all-empty
                # corpus yields a valid (empty) index, not a None/1
                # TypeError at query time
                "total_len": stats["total_len"] or 0,
                "n_buckets": n_buckets,
                # the id type rides in meta so the empty-result fast
                # path can mint a schema matching the non-empty path
                # (string doc ids must not come back as bigint)
                "id_type": docs.schema[id_col].dataType.simpleString(),
            },
            fh,
        )

    import threading

    # unique per thread, not just per process — two same-pid rebuilders
    # sharing one tmp path could publish a mixed pointer or unlink the
    # tmp between the other's write and replace
    tmp = os.path.join(
        path, f".CURRENT.tmp.{os.getpid()}.{threading.get_ident()}"
    )
    with open(tmp, "w") as fh:
        fh.write(os.path.basename(build))
    os.replace(tmp, os.path.join(path, "CURRENT"))  # atomic publish
    # superseded builds are intentionally NOT deleted here by default —
    # a lazy reader holding one stays valid; search_index_expire reclaims
    if expire_keep_last is not None:
        search_index_expire(path, keep_last=expire_keep_last)


def search_index_expire(path: str, keep_last: int = 2) -> list[str]:
    """Reclaim superseded ``build-*`` directories, keeping the live
    build plus the ``keep_last`` most recent others (a grace window
    for lazy readers that resolved CURRENT before the last rebuild).
    Returns the deleted build names. The expire_snapshots pattern from
    sources/snapshots.py: retention is a separate, explicit step,
    never part of publish.

    Concurrent-writer safety: a build dir WITHOUT ``meta.json`` is a
    rebuilder's in-flight work (meta.json is the last file a build
    writes before publishing CURRENT), not a superseded snapshot —
    expiring by mtime alone could rmtree it out from under the other
    writer, so such dirs are always skipped here and reclaimed only by
    a later expire once their meta.json exists (or never, if the
    build crashed — crashed builds are inert: CURRENT never pointed at
    them)."""
    import shutil

    live = _current_build(path)
    builds = sorted(
        (
            d
            for d in os.listdir(path)
            if d.startswith("build-")
            and d != live
            and os.path.isdir(os.path.join(path, d))
            and os.path.exists(os.path.join(path, d, "meta.json"))
        ),
        # build names encode pid+attempt, not time — age by mtime
        key=lambda d: os.path.getmtime(os.path.join(path, d)),
    )
    doomed = builds[: max(0, len(builds) - keep_last)]
    for d in doomed:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return doomed


def _current_build(path: str) -> str | None:
    """Resolve the live build dir name via the CURRENT pointer.
    Falls back to the bare layout (postings/ directly under path) for
    indexes written before atomic publish existed."""
    cur = os.path.join(path, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as fh:
            return fh.read().strip()
    if os.path.isdir(os.path.join(path, "postings")):
        return ""  # legacy flat layout
    return None


def search_index_query(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k documents for ``query_terms`` against a persisted
    index. Returns (id, score) ordered by score desc, id asc.

    Plan: the query's token buckets are computed driver-side (pure
    python xxhash is avoided — a 1-row Spark expression evaluates the
    same pmod(xxhash64) the build used, so bucketing can never drift
    from the data); postings and term stats scan ONLY those bucket
    directories; the terms table (|query| rows after filtering) is
    broadcast onto the postings; one keyed sum per doc and a
    TakeOrderedAndProject finish it. Nothing scales with corpus size
    except the matched posting lists themselves.
    """
    build = _current_build(path)
    if build is None:
        raise FileNotFoundError(f"no published search index at {path}")
    root = os.path.join(path, build) if build else path
    with open(f"{root}/meta.json") as fh:
        meta = json.load(fh)
    n_docs, n_buckets = meta["n_docs"], meta["n_buckets"]
    if n_docs == 0:
        # empty corpus: a valid index with nothing to match. The id
        # type was persisted at build time so this path's schema
        # matches the non-empty path's (unionable for string ids);
        # pre-id_type metas fall back to the historical bigint.
        id_type = meta.get("id_type", "bigint")
        return spark.createDataFrame([], f"id {id_type}, score double")
    avgdl = meta["total_len"] / max(n_docs, 1)

    terms_df = spark.createDataFrame(
        [(t.lower(),) for t in query_terms], "tok string"
    ).withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    rows = terms_df.collect()  # |query| rows — driver-bounded
    buckets = sorted({r.bucket for r in rows})
    toks = [r.tok for r in rows]

    stats = (
        spark.read.parquet(f"{root}/terms")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("tok").isin(toks))
        .select("tok", "df")
    )
    postings = (
        spark.read.parquet(f"{root}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("tok").isin(toks))
        .select("tok", "id", "tf", "dl")
    )
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        postings.join(F.broadcast(stats), "tok")
        .withColumn("term_score", idf * tf_norm)
        .groupBy("id")
        .agg(F.sum("term_score").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), "id").limit(top_k)
