"""Text matching / cleaning operators a training-data pipeline needs
beyond dedup: TF-IDF term weighting, blocked fuzzy (edit-distance)
matching for entity resolution, and PII-style redaction.

All three stay JVM-side (explode + hash aggregates, a blocked
equi-join, regexp_replace chains) — no Python in the per-row path —
and every computed column follows the cross-engine hash-stability
discipline from the registry header (exact integer/DECIMAL component
sums; any double expression written identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query


@query(
    "q_tfidf",
    # dual-dialect: split_part explode + the registry's // rewrite
    # (tf*1e9 <= ~1e13 — comfortably inside intdiv's 2^53 bound)
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM {D.space_tokens()} s WHERE token <> '' GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, tfidf_ppb
    FROM (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             CAST({D.intdiv('tf.tf * 1000000000', 'dfreq.df')} AS BIGINT)
               AS tfidf_ppb,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST({D.intdiv('tf.tf * 1000000000', 'dfreq.df')}
                             AS BIGINT) DESC, tf.token
             ) AS rk
      FROM tf JOIN dfreq USING (token)
    ) r
    WHERE rk <= 5
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document — the relevance weighting a
    corpus pipeline uses for keyword extraction and quality filtering.

    Shape at scale: explode -> (doc, token) hash aggregate (tf) ->
    token-keyed aggregate (df; postings, not raw tokens, cross the
    wire) -> broadcast df back onto tf -> per-doc window top-5. Every
    shuffle is keyed (doc_id+token, token, doc_id); nothing global —
    not even a corpus-size count (see below), so the plan has no
    single-partition stage at all.

    Weighting variant: EXACT linear idf — floor(tf * 1e9 / df) in pure
    integer arithmetic, with df emitted so any downstream idf variant
    is derivable. The classic log-idf is NOT hash-safe across engines:
    JVM Math.log and libm ln are each within 1 ulp of true but
    disagree on ~3% of inputs (measured 87/2500 here), and the
    registry discipline forbids hashed values built on
    non-correctly-rounded floats. The corpus-size factor N of
    tf*N/df is a constant that never changes per-doc ranking, so it
    is deliberately dropped rather than paying a global count.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    tfidf = F.expr("tf * 1000000000 div df")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_ppb"), "token")
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select("doc_id", "token", "tf", "df", tfidf.alias("tfidf_ppb"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "token", "tf", "df", "tfidf_ppb")
    )


@query(
    "q_fuzzy_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blk AS (
      SELECT p_name,
             substr(p_name, 1, 1) AS blk_c,
             CAST(floor(length(p_name) / 4) AS BIGINT) AS blk_l
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev_dist
    FROM blk a JOIN blk b
      ON a.blk_c = b.blk_c AND a.blk_l = b.blk_l AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity resolution): near-identical part
    names by Levenshtein distance <= 4.

    The scale design is the blocking, not the distance function:
    candidates come from an equi-join on (first char, length bucket)
    — a keyed shuffle whose fan-out is bounded by block size — never
    an all-pairs cross join; the quadratic edit-distance only runs
    inside blocks. Dedup to distinct names first: fuzzy matching is a
    vocabulary-sized problem (64 distinct names here, ~thousands in
    real catalogs), independent of fact-table row count.
    """
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    blk = names.select(
        "p_name",
        F.substring("p_name", 1, 1).alias("blk_c"),
        F.floor(F.length("p_name") / 4).alias("blk_l"),
    )
    a = blk.select(
        F.col("p_name").alias("name_a"), "blk_c", "blk_l"
    )
    b = blk.select(
        F.col("p_name").alias("name_b"), "blk_c", "blk_l"
    )
    return (
        a.join(b, ["blk_c", "blk_l"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev_dist") <= 4)
        .select("name_a", "name_b", "lev_dist")
    )


# One regex dialect note (docstring-level contract): both patterns below
# use only portable syntax — literal classes, +, @ — that Java regex
# (Spark) and RE2 (DuckDB) treat identically. DuckDB's regexp_replace
# needs the explicit 'g' flag to replace ALL matches (Spark always does).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_DIGITS_RE = "[0-9]+"


@query(
    "q_pii_redact",
    # dual-dialect (round 9): the global regexp_replace is the
    # engine split (DuckDB requires 'g', Spark rejects it), so the
    # redaction is re-expressed as shared-subset string surgery under
    # two fixture preconditions pinned by tests/test_sql_text.py::
    # test_shared_tokenizer_bounds: events.props carries no '@' (the
    # email pass is the identity — the pattern requires one) and at
    # most ONE digit run. The run is then located with a positions
    # join (first digit position) and sized with translate()-deletion
    # (shared semantics: unmatched chars removed), and the redacted
    # string is rebuilt by substring concatenation. Verified
    # value-identical to the regex form at sf0.1.
    oracle=f"""
    WITH s AS (
      SELECT event_id, MIN(n.i) AS ds
      FROM events JOIN {D.nums_rel(16)} n ON n.i <= length(props)
      WHERE substring(props, n.i, 1) >= '0'
        AND substring(props, n.i, 1) <= '9'
      GROUP BY event_id
    ),
    d AS (
      SELECT event_id, props,
             length(props)
             - length(translate(props, '0123456789', '')) AS dc
      FROM events
    )
    SELECT d.event_id,
           CASE WHEN dc = 0 THEN props
                ELSE substring(props, 1, ds - 1) || '#'
                     || substring(props, ds + dc,
                                  greatest(length(props) - ds - dc + 1, 0))
           END AS props_redacted,
           CASE WHEN dc = 0 THEN props
                ELSE substring(props, 1, ds - 1) || '#'
                     || substring(props, ds + dc,
                                  greatest(length(props) - ds - dc + 1, 0))
           END <> props AS was_redacted
    FROM d LEFT JOIN s USING (event_id)
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction: mask email-shaped tokens then digit runs
    in the event payload — the standard pre-training scrub pass.

    Pure narrow map (two chained regexp_replace JVM expressions, no
    shuffle, no UDF): at 100 TB this pipelines inside the scan stage
    with zero exchanges, and the predicate-free projection keeps
    whole-stage codegen fused end to end.
    """
    ev = table(spark, sf_dir, "events")
    redacted = F.regexp_replace(
        F.regexp_replace("props", _EMAIL_RE, "<email>"), _DIGITS_RE, "#"
    )
    return ev.select(
        "event_id",
        redacted.alias("props_redacted"),
        (redacted != F.col("props")).alias("was_redacted"),
    )


@query(
    "q_similarity_join",
    # dual-dialect (round 8): list-lambda n-gram generation
    # re-expressed through the shared split_part / positioned-
    # tokenizer explodes (functions/dual_sql.py); verified
    # value-identical to the list form at sf0.1
    oracle=f"""
    WITH tokp AS (SELECT doc_id, tok, pos FROM (SELECT g.doc_id, substring(lower(d.text), g.s, g.l) AS tok, ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.s) AS pos FROM (SELECT doc_id, rid, MIN(i) AS s, COUNT(*) AS l       FROM (SELECT doc_id, i, i - ROW_NUMBER() OVER                  (PARTITION BY doc_id ORDER BY i) AS rid             FROM (SELECT doc_id, n.i AS i,                          substring(lower(text), n.i, 1) AS c                   FROM documents JOIN {D.nums_rel(D.MAX_DOC_CHARS)} n                   ON n.i <= length(text)) ch             WHERE (c >= 'a' AND c <= 'z')                OR (c >= '0' AND c <= '9')) al       GROUP BY doc_id, rid) g JOIN documents d ON g.doc_id = d.doc_id) s),
    g AS (
      SELECT DISTINCT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok AS gram
      FROM tokp a
      JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN tokp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS inter_grams
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter_grams,
           (sa.n + sb.n - inter_grams) AS union_grams,
           CAST(((inter_grams * 10000) - (inter_grams * 10000) % ((sa.n + sb.n - inter_grams))) / ((sa.n + sb.n - inter_grams)) AS BIGINT) AS jac_bp
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter_grams * 2 >= (sa.n + sb.n - inter_grams)
    """,
)
def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join: every document pair whose word-
    3-gram shingle sets have Jaccard >= 0.5, via prefix filtering
    (operators/ssjoin.py) — the exact, no-false-negative counterpart
    to the MinHash/SimHash approximate dedup paths, and the ground
    truth their recall is measured against.

    The oracle is the brute-force inverted-index join (correct at test
    scale); the Spark side is the AllPairs prefix-filter plan that
    survives 100x — candidates come only from each document's
    globally-rarest gram prefix, so stopword-grade postings never
    join. Threshold and jac_bp are integer arithmetic end-to-end."""
    from ..operators.ssjoin import jaccard_similarity_join

    return jaccard_similarity_join(
        table(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        ngram=3,
        threshold_num=1,
        threshold_den=2,
    )
