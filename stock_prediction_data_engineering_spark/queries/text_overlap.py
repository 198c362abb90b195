"""Exact-substring overlap dedup (winnowing fingerprints) over the
``documents`` table — the verbatim-run counterpart to the set-
similarity dedup family (operators/winnow.py has the algorithm and
scale notes; operators/dedup.py and operators/ssjoin.py cover the
Jaccard axis this deliberately does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ..functions import dual_sql as D

_K, _W, _CAP = 24, 8, 50


@query(
    "q_substring_dedup",
    # dual-dialect (round 8): list-lambda n-gram generation
    # re-expressed through the shared split_part / positioned-
    # tokenizer explodes (functions/dual_sql.py); verified
    # value-identical to the list form at sf0.1
    oracle=f"""
    WITH m AS (
      SELECT text AS txt, MIN(doc_id) AS rep,
             CAST(COUNT(*) AS BIGINT) AS dup
      FROM documents WHERE length(text) >= 31
      GROUP BY text
    ),
    kg AS (
      SELECT rep, n.i AS pos, (CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 1, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 72057594037927936 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 2, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 4503599627370496 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 3, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 281474976710656 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 4, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 17592186044416 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 5, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 1099511627776 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 6, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 68719476736 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 7, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 4294967296 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 8, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 268435456 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 9, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 16777216 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 10, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 1048576 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 11, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 65536 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 12, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 4096 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 13, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 256 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 14, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 16 + CAST(position(substring(substring(md5(substring(txt, n.i, 24)), 1, 15), 15, 1) IN '0123456789abcdef') - 1 AS BIGINT) * 1) AS h,
             length(txt) - 23 AS npos
      FROM m JOIN {D.nums_rel(D.MAX_DOC_CHARS)} n
        ON n.i <= length(txt) - 23
    ),
    win AS (
      SELECT rep, pos, npos,
             MIN(h) OVER (PARTITION BY rep ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND 7 FOLLOWING) AS fp
      FROM kg
    ),
    fps AS (
      SELECT DISTINCT rep, fp FROM win WHERE pos + 7 <= npos
    ),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50),
    fps2 AS (SELECT fps.rep, fps.fp FROM fps JOIN rare USING (fp)),
    pairs AS (
      SELECT a.rep AS doc_a, b.rep AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fp
      FROM fps2 a JOIN fps2 b ON a.fp = b.fp AND a.rep < b.rep
      GROUP BY a.rep, b.rep
    ),
    mg AS (
      SELECT DISTINCT p.doc_a, p.doc_b, ka.pos AS pa, kb.pos AS pb
      FROM pairs p
      JOIN kg ka ON ka.rep = p.doc_a
      JOIN kg kb ON kb.rep = p.doc_b AND kb.h = ka.h
    ),
    runs AS (
      SELECT doc_a, doc_b, pa - pb AS diag, pa,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS isl
      FROM mg
    ),
    spans AS (
      SELECT doc_a, doc_b,
             CAST(MAX(cnt) + 23 AS BIGINT) AS max_span_len
      FROM (SELECT doc_a, doc_b, diag, isl, COUNT(*) AS cnt
            FROM runs GROUP BY doc_a, doc_b, diag, isl) r
      GROUP BY doc_a, doc_b
    )
    SELECT p.doc_a, p.doc_b, p.shared_fp, da.dup AS dup_a,
           db.dup AS dup_b, s.max_span_len
    FROM pairs p
    JOIN m da ON da.rep = p.doc_a
    JOIN m db ON db.rep = p.doc_b
    JOIN spans s ON s.doc_a = p.doc_a AND s.doc_b = p.doc_b
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing a verbatim character run of >= 31 chars
    (k=24 char k-grams, winnowing window w=8 — guarantee length
    k+w-1), the exact-substring contamination screen that Jaccard
    dedup misses: a long quote inside two otherwise-unrelated
    documents never clears a set-similarity threshold but always
    shares a winnowing fingerprint.

    Fingerprinting is row-local array algebra (no shuffle); pairs are
    generated only from fingerprints rarer than 50 distinct texts
    (boilerplate is a frequency signal, not a pair signal), so every
    posting list — and therefore the self-join — is bounded at any
    corpus size. Defined over DISTINCT texts with cluster sizes in
    the output, so the result stays pair-linear even on fully
    duplicated corpora.

    ``max_span_len`` reports each pair's longest shared verbatim run
    in characters (Lee et al. ACL'22 match-length semantics) — exact,
    computed pair-bounded from constant-offset runs of matching
    k-gram hashes (operators/winnow.py)."""
    from ..operators.winnow import winnow_pairs

    return winnow_pairs(
        table(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        k=_K,
        w=_W,
        df_cap=_CAP,
        with_spans=True,
    )


@query("q_substring_incremental")  # rows-only: filesystem side effect
def q_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-substring screening end-to-end: build the
    persisted winnowing index over the standing corpus (doc_id % 5
    != 0), probe the remaining ~20 % as the arriving batch, and
    return its verbatim-overlap hits (new_id, corpus_id, shared_fp) —
    the O(batch)-per-ingest contamination gate that replaces
    re-fingerprinting the whole corpus (operators/winnow.py
    winnow_index_write/probe; bucket-pruned scan, broadcast batch,
    df-capped postings). Rows-only: the oracle cannot observe the
    filesystem side effect."""
    import os
    import tempfile

    from ..operators.winnow import winnow_index_probe, winnow_index_write

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
    os.makedirs(scratch, exist_ok=True)
    path = os.path.join(
        tempfile.mkdtemp(dir=scratch, prefix="wn_idx_"), "idx"
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    winnow_index_write(docs.filter(F.col("doc_id") % 5 != 0), path)
    return winnow_index_probe(docs.filter(F.col("doc_id") % 5 == 0), path)
