"""LLM-training-data text operators (SURVEY.md §2.11 L1/L3/L4) over the
``documents`` table. North-star extensions (BASELINE.json): the
reference stops at OHLCV ETL; a 100 TB training-data pipeline needs
dedup and text analysis as first-class engine ops.

The heavy members of the family (MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup, language-ID, quality scoring, fingerprinting) live
in operators/dedup.py and operators/text.py and are exposed as
rows-only queries — their outputs are not ANSI-SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY text_hash
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (L1): hash-groupBy on content, keep the lowest id.

    At 100 TB this is one shuffle on md5(text) — no sort, no window —
    and the canonical first pass before any near-dup method.
    """
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query(
    "q_dedup_resolve",
    oracle="""
    SELECT doc_id,
           CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS component,
           doc_id = min(doc_id) OVER (PARTITION BY text) AS is_canonical
    FROM documents
    """,
)
def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup RESOLUTION: pair graph -> connected components -> one
    canonical survivor per cluster (operators/dedup.py
    connected_components / resolve_duplicates — the iterative
    min-label-propagation operator).

    Driven here by exact-duplicate pairs — so the iterative
    distributed algorithm has an ANSI-SQL oracle (min id per
    identical-text group) and gets a hash-checked correctness signal;
    the same operator consumes MinHash/SimHash pair outputs unchanged
    (tests cover multi-hop chains that plain GROUP BY cannot express).

    Pair generation is STAR-shaped, not clique-shaped: a duplicate
    cluster of m copies needs only its m-1 (min-id hub → member)
    edges for connectivity — the hash self-join's C(m,2) clique edges
    feed the label-propagation join m/2× more rows for the identical
    component answer. Measured at sf10 (100× duplication): 47.1 s
    clique → 6.4 s star. One groupBy(hash) + one hash join, both
    map-side-combinable; components and canonicals are unchanged.
    """
    from ..operators.dedup import resolve_duplicates

    docs = table(spark, sf_dir, "documents")
    with_hash = docs.select("doc_id", F.md5("text").alias("h"))
    hub = with_hash.groupBy("h").agg(F.min("doc_id").alias("id_a"))
    pairs = (
        with_hash.join(hub, "h")
        .filter(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    return resolve_duplicates(docs, pairs).select(
        "doc_id", "component", "is_canonical"
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
           CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                AS DOUBLE) / COUNT(*) AS avg_words,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text statistics per language (L3): doc counts, length and
    token-count moments. Integer sums are exact, so averages are a
    single deterministic double division."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("n_chars")).alias("avg_chars"),
        (F.sum(n_words).cast("double") / F.count("*")).alias("avg_words"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_corpus_curation",
    oracle="""
    WITH canon AS (
        SELECT doc_id, lang, n_chars, text,
               min(doc_id) OVER (PARTITION BY text) AS keeper,
               length(text) - length(replace(text, ' ', '')) + 1
                 AS word_cnt
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(word_cnt AS BIGINT) AS word_cnt
    FROM canon
    WHERE doc_id = keeper
      AND n_chars BETWEEN 50 AND 20000
      AND word_cnt >= 10
      AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / word_cnt
          BETWEEN 2.0 AND 12.0
    ORDER BY doc_id
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-training-data curation composite: exact-dedup to the
    canonical copy (min doc_id per identical text, a per-text window —
    partitioned, scale-safe), then quality gates (length band, minimum
    word count, mean-word-length band — the stopword/garbage
    heuristics every corpus pipeline applies before training). One
    pass, no UDFs; every predicate sits on scan-derived columns."""
    d = table(spark, sf_dir, "documents")
    word_cnt = F.size(F.split("text", " "))
    keeper = F.min("doc_id").over(Window.partitionBy("text"))
    mean_wlen = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / F.col("word_cnt")
    )
    return (
        d.select("doc_id", "lang", "n_chars", "text", word_cnt.alias("word_cnt"))
        .withColumn("keeper", keeper)
        .filter(
            (F.col("doc_id") == F.col("keeper"))
            & F.col("n_chars").between(50, 20000)
            & (F.col("word_cnt") >= 10)
            & mean_wlen.between(2.0, 12.0)
        )
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("word_cnt").cast("bigint").alias("word_cnt"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE (lang = 'en' AND substr(md5(text), 1, 1) IN ('0','1','2','3','4','5','6','7'))
       OR (lang <> 'en' AND substr(md5(text), 1, 1) IN ('0','1','2','3'))
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content hash: keep ~50% of
    'en' docs and ~25% of every other stratum, by first-hex-digit
    membership of md5(text). Unlike TABLESAMPLE/rand this is
    reproducible across engines, runs, and repartitioning — the
    property a train/holdout split actually needs — and it is a pure
    per-row predicate: no shuffle, no state."""
    d = table(spark, sf_dir, "documents")
    digit = F.substring(F.md5("text"), 1, 1)
    keep = (
        (F.col("lang") == "en") & digit.isin(*"01234567")
    ) | ((F.col("lang") != "en") & digit.isin(*"0123"))
    return d.filter(keep).select("doc_id", "lang")


@query(
    "q_token_explode",
    # dual-dialect: split_part + numbers-join explode (dual_sql.py
    # space_tokens) — one text for DuckDB, Spark SQL, and the plan
    oracle=f"""
    SELECT token, COUNT(*) AS tf
    FROM {D.space_tokens()} s
    WHERE token <> ''
    GROUP BY token
    """,
)
def q_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + global term frequency (L4): split -> explode ->
    hash-agg. The explode is pipelined into a partial agg before the
    shuffle, so the exchanged data is vocabulary-sized, not token-sized.
    """
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
    )


@query(
    "q_vocab_topk",
    oracle=f"""
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM {D.space_tokens()} s
    WHERE token <> ''
    GROUP BY token
    ORDER BY df DESC, tf DESC, token
    LIMIT 100
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: top-100 terms by document frequency
    (the first step of a vocab/IDF table or a BPE seed lexicon).

    Explode -> two-level aggregate (term frequency + distinct-doc
    count; the distinct expands to a (token, doc_id) partial agg so
    the shuffle carries postings, not raw tokens) -> final
    orderBy().limit(), which plans as TakeOrderedAndProject — each
    task keeps only its local top-100, the driver merges k-sized
    heaps, no global sort. (df, tf, token) is a total order, so the
    selected 100 rows are deterministic across engines.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "token")
        .limit(100)
    )
