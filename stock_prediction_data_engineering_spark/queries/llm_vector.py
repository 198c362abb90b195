"""Vector similarity operators (SURVEY.md §2.11 L5/L6) over the
``embeddings`` table (64-dim float arrays).

Brute-force dot/cosine stays JVM-side via higher-order array
functions (zip_with + aggregate fold) — no Python boundary, no UDF.
The fold is sequential per row, so double accumulation is
deterministic; DuckDB's list_dot_product folds in the same index
order, and results are rounded to 4 decimals on both sides.

The ANN scale path (LSH bucketing) lives in operators/similarity.py
(rows-only query q_ann_lsh).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def dot(a: Column | str, b: Column | str) -> Column:
    """JVM-side dot product of two float array columns, in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> DataFrame:
    return (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").alias("qvec"))
    )


@query(
    "q_vector_dot",
    oracle="""
    SELECT e.vec_id,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])), 4) AS dot
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    """,
)
def q_vector_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force dot product of every embedding against a query
    vector (L5). The single-row query side is broadcast; the scan side
    streams — linear, shuffle-free."""
    e = table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return e.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(dot("embedding", "qvec"), 4).alias("dot")
    )


@query(
    "q_topk_similar",
    oracle="""
    WITH sims AS (
        SELECT e.vec_id,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))),
                     4) AS cosine
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    )
    SELECT vec_id, cosine
    FROM sims
    ORDER BY cosine DESC, vec_id
    LIMIT 20
    """,
)
def q_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine similarity search, brute-force baseline (L6).

    Ranking happens on the 4-decimal-rounded similarity with vec_id as
    the tiebreak, so the top-k set is identical across engines. Spark
    plans TakeOrderedAndProject — per-partition top-k then a k-sized
    merge on the driver, no global sort.
    """
    e = table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    cosine = F.round(
        dot("embedding", "qvec") / (norm("embedding") * norm("qvec")), 4
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(20)
    )
