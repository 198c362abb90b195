"""MLlib model queries: batch scoring, text classification, embedding
clustering, Word2Vec neighbors.

These are the downstream-model surface the reference's lake exists to
feed (reference README.md:46 "further analysis ... SageMaker";
BASELINE.json approach "Spark DataFrame ETL + MLlib"). All rows-only:
model outputs route through MLlib solvers/BLAS, so values are
engine-internal — correctness is pinned by tests/test_ml_pipelines.py
(the OLS scorer against a closed-form numpy twin to float precision;
the classifier against its own training-set confusion structure).

Scale notes: every fit/transform here is a distributed MLlib job —
feature assembly is JVM-side window algebra or HashingTF (no
vocabulary state), LinearRegression solver="normal" reduces to one
X'X gram aggregate (d² doubles per partition, d=5), KMeans shuffles
only k×d centers per iteration. Nothing materializes on the driver
but coefficient vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("q_model_scoring")
def q_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward batch inference: fit the OLS next-step return
    model on the first walk-forward training span of the lake's OHLCV
    bars, score every later bar, return (company, bar_date,
    prediction). The train/score boundary is a date predicate — no
    future data reaches the fit (ml/backtest.py protocol)."""
    from ..ml.backtest import walk_forward_splits
    from ..ml.features import FEATURE_COLS, bar_features
    from ..ml.pipelines import fit_return_scorer, score_returns
    from ..sources.lake import ohlcv_from_events

    feats = bar_features(ohlcv_from_events(spark, sf_dir))
    folds = walk_forward_splits(feats, "bar_date", n_folds=1)
    fold = folds[0]
    model = fit_return_scorer(fold.train, FEATURE_COLS)
    return score_returns(model, fold.test, ["company", "bar_date"]).orderBy(
        "company", "bar_date"
    )


@query("q_doc_classify")
def q_doc_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-classification confusion profile: fit the HashingTF/IDF/
    LogisticRegression pipeline to predict a document's source-language
    label, score the corpus, and return (lang, predicted, n) cells —
    the aggregate a curation pipeline monitors for label drift."""
    from ..ml.pipelines import fit_doc_classifier, score_doc_classifier

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    model = fit_doc_classifier(docs, label_col="lang")
    scored = score_doc_classifier(model, docs, label_col="lang")
    return (
        scored.groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


@query("q_kmeans_clusters")
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding segmentation: MLlib KMeans (k=8, fixed seed) over the
    embeddings table; returns per-cluster size + mean intra-cluster
    label purity proxy (distinct labels) — the shape of a corpus-
    domain clustering audit."""
    from ..ml.pipelines import cluster_embeddings

    emb = table(spark, sf_dir, "embeddings")
    assigned = cluster_embeddings(emb, k=8, seed=42)
    return (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("cluster")
    )


@query("q_word2vec_neighbors")
def q_word2vec_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2Vec distributional neighbors of a corpus-frequent token —
    the embedding-side twin of the n-gram co-occurrence audits in
    llm_curation. Fixed seed + single fit partition keeps the output
    deterministic per environment (rows-only by design)."""
    from ..ml.pipelines import word2vec_neighbors

    docs = table(spark, sf_dir, "documents")
    return word2vec_neighbors(docs, probe="data", top_n=5)


@query("q_pca_variance")  # rows-only: MLlib eigensolver output
def q_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embeddings table: explained-variance share of the
    top-5 principal components, in basis points — the dimensionality
    screen run before choosing an index or compression width for a
    vector corpus.

    MLlib's ml.feature.PCA computes the d×d Gram/covariance matrix in
    ONE distributed tree-aggregate (d = embedding width, so the
    aggregate state is d² doubles per partition regardless of row
    count) and eigendecomposes the d×d result on the driver — the
    canonical tall-skinny layout: nothing row-sized ever leaves the
    executors. Rows-only: eigensolver output is engine-internal;
    pinned against a numpy covariance eigendecomposition to float
    tolerance in tests/test_ml_pipelines.py."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    emb = table(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        )
    )
    k = 5
    model = PCA(k=k, inputCol="features", outputCol="pc").fit(emb)
    ev = model.explainedVariance
    return spark.createDataFrame(
        [
            (int(i), int(round(float(ev[i]) * 10000)))
            for i in range(k)
        ],
        "component: bigint, explained_var_bp: bigint",
    )


@query("q_als_recommend")  # rows-only: factorization output is solver-internal
def q_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback ALS recommendations (Hu/Koren/Volinsky
    ICDM'08 via MLlib ALS): top-3 items per user from the events
    interaction matrix — the collaborative-filtering pillar of the
    MLlib surface (ml/pipelines.py:als_recommendations has the
    block-partitioned scale story). Deterministic for a fixed seed;
    preference-reconstruction lift pinned in
    tests/test_ml_pipelines.py."""
    from ..ml.pipelines import als_recommendations

    events = table(spark, sf_dir, "events")
    return als_recommendations(events, top_n=3).orderBy("user_id", "rec_rank")


@query("q_isotonic_calibration")  # rows-only: MLlib PAVA solver output
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of the q_calibration_bins
    propensity score via MLlib IsotonicRegression — the step-function
    recalibration (Zadrozny & Elkan KDD'02) that reliability diagrams
    motivate. Returns one row per distinct raw score:
    (pred_bp, n_users, iso_rate_bp).

    Scores are pre-pooled per distinct value (mean label, weight =
    user count) BEFORE the fit, so the isotonic solution is unique and
    the distributed parallel-PAVA (per-partition pools merged on the
    driver — aggregate state is pool-count-bounded, never row-bounded)
    is pinned exactly against a sequential numpy PAVA twin in
    tests/test_ml_pipelines.py. Only the pooled table (bounded by the
    score domain, ~10k values) leaves the row scan."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("n_views"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    pooled = (
        u.select(
            F.expr("(n_views * 10000) div (n_views + 5)").alias("pred_bp"),
            "converted",
        )
        .groupBy("pred_bp")
        .agg(
            F.count("*").cast("double").alias("w"),
            F.avg("converted").alias("y"),
        )
    )
    feats = VectorAssembler(
        inputCols=["pred_bp"], outputCol="features"
    ).transform(pooled.withColumn("pred_bp", F.col("pred_bp").cast("double")))
    model = IsotonicRegression(
        labelCol="y", weightCol="w", featuresCol="features"
    ).fit(feats)
    fitted = model.transform(feats)
    return fitted.select(
        F.col("pred_bp").cast("bigint").alias("pred_bp"),
        F.col("w").cast("bigint").alias("n_users"),
        F.round(F.col("prediction") * 10000).cast("bigint").alias("iso_rate_bp"),
    ).orderBy("pred_bp")
