"""Product-quantization ANN — the third L7 scale path (SURVEY.md
§2.11), after hyperplane LSH and IVF-Flat (operators/similarity.py).

Why PQ at 100 TB: LSH and IVF prune *which* vectors are scanned, but
every scanned row still reads the full float vector (256 B at 64-dim
float32; KBs for modern embedding dims). PQ compresses each vector to
``m`` one-byte centroid codes (m=8 → 32× smaller at 64-dim), so the
candidate scan reads tiny code arrays and scores them with ``m``
table lookups per row — a 100 TB embedding corpus becomes a ~3 TB
code lake, and the scan cost is memory-bandwidth on codes, not FLOPs
on floats. This is the standard quantized-search design (Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011).

Shape of the implementation, Spark-first:

- **Codebook fit is O(1) in corpus size.** The per-subspace k-means
  codebooks total ``m × 2^nbits × (dim/m)`` floats (≈64 KB at the
  defaults) and are fit on a deterministic bounded sample collected
  to the driver (hash-ordered top-k — TakeOrderedAndProject, no full
  sort; the collect is bounded metadata like the ranker offset maps,
  never O(corpus)). The FULL corpus only flows through the
  distributed, map-only encode.
- **Encoding is Arrow-vectorized.** A pandas_udf batch-encodes
  vectors with one numpy argmin per subspace; the codebooks ride in
  the closure. A 256-way nearest-centroid argmin is exactly the
  "genuinely can't express with built-in operators" case the UDF
  budget exists for.
- **Scoring is pure JVM.** The query-side lookup table (``m × 2^nbits``
  inner products, computed driver-side in microseconds) is broadcast
  as one array literal row; the asymmetric-distance score of a code
  array is ``aggregate(transform(codes, (c, i) -> lut[i·K + c]))`` —
  whole-stage-codegen'd, no Python anywhere in the corpus scan.

Vectors are L2-normalized before both fit and encode, so the ADC
inner product approximates cosine directly (same geometry trick as
IVF's spherical k-means, operators/similarity.py:97).

Reference scope: the reference repo (a 131-line pandas ingest DAG)
has no vector search; this module is north-star surface per
BASELINE.json's LLM-pipeline brief.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import l2_normalize_expr


def pq_fit_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
    sample_limit: int = 16384,
    n_iter: int = 10,
):
    """Fit per-subspace k-means codebooks on a bounded sample.

    Returns an ndarray of shape ``(m, 2^nbits, dim // m)``. The
    sample is the ``sample_limit`` corpus rows with the smallest
    ``xxhash64(vector)`` — deterministic across runs and executors,
    and executed as per-partition top-k (TakeOrderedAndProject), not
    a global sort. Lloyd iterations run in numpy on the driver: the
    input is ≤ sample_limit × dim floats (~4 MB at the defaults),
    and the output codebook is ~64 KB — both O(1) in corpus size.

    ``k`` is clamped to the sample size so tiny corpora (tests) fit
    without empty-cluster thrash; empty clusters keep their previous
    center (standard Lloyd fallback).
    """
    import numpy as np

    rows = (
        corpus.select(l2_normalize_expr(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col("v")))
        .limit(sample_limit)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    k = min(1 << nbits, n)
    rng = np.random.default_rng(seed)
    Xs = X.reshape(n, m, dsub)
    codebooks = np.empty((m, k, dsub), dtype=np.float64)
    for sub in range(m):
        data = Xs[:, sub, :]
        centers = data[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(n_iter):
            # ||x-c||² argmin via -2x·c + ||c||² (||x||² constant per row)
            d2 = -2.0 * data @ centers.T + (centers**2).sum(axis=1)
            assign = d2.argmin(axis=1)
            for j in range(k):
                mask = assign == j
                if mask.any():
                    centers[j] = data[mask].mean(axis=0)
        codebooks[sub] = centers
    return codebooks


def pq_encode_df(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Add the PQ code array (``array<smallint>``, length m) to every
    corpus row. Arrow-batched: one numpy argmin per subspace per
    batch; the ~64 KB codebook rides in the task closure."""
    import numpy as np

    cb = np.asarray(codebooks)
    m, _, dsub = cb.shape
    cb_norms = (cb**2).sum(axis=2)  # (m, k), precomputed once

    @F.pandas_udf("array<smallint>")
    def _encode(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        norms = np.sqrt((X**2).sum(axis=1, keepdims=True))
        np.divide(X, norms, out=X, where=norms > 0)
        B = X.shape[0]
        Xs = X.reshape(B, m, dsub)
        codes = np.empty((B, m), dtype=np.int16)
        for sub in range(m):
            d2 = -2.0 * Xs[:, sub, :] @ cb[sub].T + cb_norms[sub]
            codes[:, sub] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.withColumn(code_col, _encode(F.col(vec_col)))


class PqIndex:
    """A built PQ index: the compressed (id, codes) table + the tiny
    codebook matrix. Build once, search many times. When ``path`` was
    given to :func:`pq_build`, ``table`` reads the persisted code
    lake — at scale this is the ~32×-smaller artifact every query
    scans instead of the raw embedding lake."""

    def __init__(self, table: DataFrame, codebooks, id_col: str):
        self.table = table
        self.codebooks = codebooks
        self.id_col = id_col

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]


def pq_build(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
    sample_limit: int = 16384,
    path: str | None = None,
) -> PqIndex:
    """Fit codebooks (bounded sample) and encode the full corpus
    (one distributed map-only pass). ``path`` persists the code
    table; searches then scan the compressed lake only."""
    codebooks = pq_fit_codebooks(
        corpus, vec_col, m=m, nbits=nbits, seed=seed, sample_limit=sample_limit
    )
    encoded = pq_encode_df(corpus, codebooks, vec_col).select(id_col, "codes")
    if path is not None:
        encoded.write.mode("overwrite").parquet(path)
        encoded = corpus.sparkSession.read.parquet(path)
    return PqIndex(encoded, codebooks, id_col)


def _lut_row(spark: SparkSession, codebooks, qvec) -> DataFrame:
    """The query's asymmetric-distance lookup table as a 1-row
    DataFrame: lut[sub·k + j] = <q_sub, codebook[sub][j]>. Computed
    driver-side (m × k × dsub ≈ 16k FLOPs) and broadcast."""
    import numpy as np

    cb = np.asarray(codebooks)
    m, k, dsub = cb.shape
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    qs = q.reshape(m, dsub)
    lut = np.einsum("sd,skd->sk", qs, cb).reshape(m * k)
    return spark.createDataFrame(
        [(lut.tolist(),)], "lut array<double>"
    )


def adc_score_expr(codes, lut, k: int):
    """JVM-side asymmetric-distance score of one code array:
    sum over subspaces of lut[sub·k + code]. element_at is 1-based."""
    return F.aggregate(
        F.transform(
            codes,
            lambda c, i: F.element_at(
                lut, (i * F.lit(k) + c.cast("int") + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_search(
    index: PqIndex,
    query_vec: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by ADC over the compressed code table.

    The corpus-side plan is: scan (id, codes) → per-row JVM fold of m
    array lookups → TakeOrderedAndProject. No Python, no shuffle, no
    float vectors read. Scores approximate cosine (vectors were
    normalized at encode time); quantization distortion is bounded by
    the per-subspace k-means error, measured by the recall harness
    (tools/ann_recall.py)."""
    qrow = query_vec.select(vec_col).first()
    lut_df = _lut_row(index.table.sparkSession, index.codebooks, qrow[0])
    score = adc_score_expr(F.col("codes"), F.col("lut"), index.k)
    return (
        index.table.crossJoin(F.broadcast(lut_df))
        .select(
            F.col(index.id_col),
            F.round(score, 4).alias("adc_score"),
        )
        .orderBy(F.col("adc_score").desc(), F.col(index.id_col))
        .limit(k)
    )


def pq_topk(
    corpus: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """One-shot PQ approximate top-k: :func:`pq_build` +
    :func:`pq_search`. Repeated searches should build (and persist)
    the index once and reuse it."""
    index = pq_build(corpus, vec_col, id_col, m=m, nbits=nbits, seed=seed)
    return pq_search(index, query_vec, k, vec_col)
