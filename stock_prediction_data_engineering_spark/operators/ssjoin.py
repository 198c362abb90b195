"""Exact set-similarity join via global-frequency prefix filtering.

The dedup family (operators/dedup.py) finds near-duplicates
*approximately* (MinHash/SimHash buckets, candidate verify). This
operator is the exact counterpart: ALL pairs whose token-set Jaccard
clears a threshold, with no false negatives — the AllPairs/PPJoin
prefix-filter algorithm (Bayardo et al., WWW'07; public literature)
expressed as DataFrame ops.

Why it scales: a naive inverted-index join explodes on every shared
token. Prefix filtering orders each document's tokens by GLOBAL
document frequency (rarest first) and indexes only the first
``n - ceil(t*n) + 1`` of them: if Jaccard(A,B) >= t then
|A∩B| >= ceil(t*max(|A|,|B|)), and two sets with overlap >= c must
share a token within their (size-c+1)-prefixes under any one global
order. So candidates are generated from the *rarest* slice of each
document — the postings lists that blow up (stopword-grade tokens)
are exactly the ones the prefix never indexes. Verification is
candidate-bounded and exact.

No reference-repo counterpart (the reference is a 131-line ingest DAG,
reference dags/stock_data_airflow_local_aws_s3.py); this is north-star
LLM-curation surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text as an array.

    Empty tokens from the regex split are removed BEFORE windowing so
    the gram stream matches a 1-based SQL reconstruction exactly.
    """
    c = F.col(text) if isinstance(text, str) else text
    ws = F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != F.lit("")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + k + 1) for k in range(n)]
        ),
    )
    # sequence(0, x) counts DOWN when x < 0 — guard short documents.
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.lit(None)).cast("array<string>")
    )


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= num/den (exact).

    Returns (doc_a, doc_b, inter_grams, union_grams, jac_bp) with
    doc_a < doc_b; the threshold test and jac_bp are pure integer
    arithmetic, so results are bit-identical across engines.

    Plan shape (all keyed, nothing global):
      1. one scan -> distinct (id, gram) explode;
      2. gram document frequencies (vocabulary-sized keyed count);
      3. per-doc rarest-first rank: window keyed by id over the
         doc's own grams (bounded by document length);
      4. candidate pairs from prefix x prefix on gram — the only
         quadratic-risk join, bounded because prefixes hold only
         globally-rare grams (a gram's posting length is its df rank);
      5. exact verify bounded by |candidates|: count shared grams per
         pair, integer cross-multiplied threshold.
    """
    grams = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(word_ngrams(text_col, ngram)).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    dfreq = grams.groupBy("gram").agg(F.count("*").alias("df"))

    ranked = grams.join(dfreq, "gram").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("id").orderBy("df", "gram")
        ),
    )
    # prefix length = n - ceil(t*n) + 1, all integer:
    # ceil(a*n/b) = (a*n + b - 1) div b
    pref = (
        ranked.join(sizes, "id")
        .withColumn(
            "plen",
            # n - ceil(num*n/den) + 1, with ceil as exact integer div
            F.expr(
                f"n - (({threshold_num} * n + {threshold_den - 1}) "
                f"div {threshold_den}) + 1"
            ),
        )
        .filter(F.col("rnk") <= F.col("plen"))
        .select("id", "gram")
    )

    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )

    ga = grams.select(F.col("id").alias("doc_a"), F.col("gram").alias("g"))
    gb = grams.select(F.col("id").alias("doc_b"), F.col("gram").alias("g"))
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter_grams"))
    )
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_grams", F.col("na") + F.col("nb") - F.col("inter_grams"))
        .filter(
            F.col("inter_grams") * threshold_den
            >= F.lit(threshold_num) * F.col("union_grams")
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_grams",
            "union_grams",
            F.expr("(inter_grams * 10000) div union_grams").alias("jac_bp"),
        )
    )
