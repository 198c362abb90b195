"""MLlib pipeline surface: time-series-safe model selection, text
feature pipelines (HashingTF/IDF, Word2Vec, CountVectorizer), and
batch model scoring.

The reference stops at lake construction and names downstream model
training as the purpose ("further analysis ... SageMaker", reference
README.md:46; approach "Spark DataFrame ETL + MLlib", BASELINE.json).
This module supplies that downstream as first-class engine surface:

- :func:`walk_forward_cv` — hyperparameter selection over the
  walk-forward folds of ml/backtest.py. MLlib's ``CrossValidator``
  cannot express this even with ``foldCol``: its fold-i training set
  is *everything except* fold i, which trains on the future. The
  correct protocol fits each candidate only on data strictly before
  its validation window, so the selection loop is implemented here
  directly over MLlib estimators/evaluators (driver-side loop over a
  handful of param settings and folds; every fit/transform inside is
  fully distributed — at 100 TB the loop body is the cost, not the
  loop).
- :func:`fit_doc_classifier` / :func:`score_doc_classifier` — the
  canonical MLlib text pipeline (RegexTokenizer -> HashingTF -> IDF ->
  StringIndexer -> LogisticRegression -> IndexToString). HashingTF
  keeps the feature space fixed-width with NO vocabulary shuffle or
  driver-side dictionary — the only text featurizer that is O(0) state
  at 100 TB corpus scale.
- :func:`fit_return_scorer` / batch scoring — OLS next-step return
  model (solver="normal", no regularization) so tests can pin the
  distributed fit against a closed-form numpy twin to float precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def walk_forward_cv(
    feats: DataFrame,
    param_settings: list[dict],
    build_estimator,
    date_col: str = "bar_date",
    n_folds: int = 3,
    label_col: str = "label",
    metric: str = "rmse",
):
    """Select the best param setting by mean held-out metric across
    walk-forward folds, then refit it on ALL data.

    ``build_estimator(params) -> Estimator`` constructs the (pipeline)
    estimator for one setting; ``param_settings`` is a list of plain
    dicts (the ParamGridBuilder cross-product, materialized). Returns
    ``(best_model, best_params, results)`` where results is
    ``[{"params": ..., "fold_metrics": [...], "mean": ...}, ...]``.

    Lower-is-better metrics only (rmse/mae); flip the comparison for
    a gain metric at the call site by negating in the evaluator.
    """
    from pyspark.ml.evaluation import RegressionEvaluator

    from .backtest import walk_forward_splits

    folds = [
        f
        for f in walk_forward_splits(feats, date_col, n_folds)
        if f.train.head(1) and f.test.head(1)
    ]
    if not folds:
        raise ValueError("no non-empty walk-forward folds")
    evaluator = RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName=metric
    )
    results = []
    for params in param_settings:
        fold_metrics = []
        for f in folds:
            model = build_estimator(params).fit(f.train)
            fold_metrics.append(evaluator.evaluate(model.transform(f.test)))
        results.append(
            {
                "params": params,
                "fold_metrics": fold_metrics,
                "mean": sum(fold_metrics) / len(fold_metrics),
            }
        )
    best = min(results, key=lambda r: r["mean"])
    best_model = build_estimator(best["params"]).fit(feats)
    return best_model, best["params"], results


# ---------------------------------------------------------------------------
# Text classification pipeline


def doc_classifier_pipeline(
    text_col: str = "text",
    label_col: str = "lang",
    n_features: int = 1 << 12,
    reg_param: float = 0.01,
):
    """RegexTokenizer -> HashingTF -> IDF -> StringIndexer ->
    LogisticRegression. StringIndexer orders labels by frequency
    (deterministic); HashingTF needs no fitted vocabulary, so the only
    fitted text state is the IDF vector (n_features doubles)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        IDF,
        HashingTF,
        RegexTokenizer,
        StringIndexer,
    )

    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="__toks",
                pattern=r"[^a-z0-9]+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__toks", outputCol="__tf", numFeatures=n_features
            ),
            IDF(inputCol="__tf", outputCol="features"),
            StringIndexer(
                inputCol=label_col,
                outputCol="label",
                handleInvalid="keep",
                stringOrderType="frequencyDesc",
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                regParam=reg_param,
                family="multinomial",
            ),
        ]
    )


def fit_doc_classifier(docs: DataFrame, **kw):
    """Fit the text-classification pipeline on a documents table."""
    return doc_classifier_pipeline(**kw).fit(docs)


def score_doc_classifier(model, docs: DataFrame, label_col: str = "lang"):
    """Batch inference: returns the input rows plus ``predicted``
    (the label STRING, mapped back from the model's index space via
    IndexToString using the fitted StringIndexer's labels)."""
    from pyspark.ml.feature import IndexToString

    indexer = next(
        s for s in model.stages if type(s).__name__ == "StringIndexerModel"
    )
    pred = model.transform(docs)
    back = IndexToString(
        inputCol="prediction", outputCol="predicted", labels=indexer.labels
    )
    return back.transform(pred).drop(
        "__toks", "__tf", "features", "label", "rawPrediction",
        "probability", "prediction",
    )


# ---------------------------------------------------------------------------
# Return-model batch scoring (numpy-pinnable OLS)


def fit_return_scorer(train: DataFrame, feature_cols: list[str]):
    """VectorAssembler -> LinearRegression with solver="normal" and NO
    regularization/standardization: the fit is the exact least-squares
    solution, so a closed-form numpy lstsq twin reproduces the
    coefficients and predictions to float precision — the pinning
    contract tests/test_ml_pipelines.py enforces."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=feature_cols, outputCol="features"),
            LinearRegression(
                featuresCol="features",
                labelCol="label",
                solver="normal",
                regParam=0.0,
                elasticNetParam=0.0,
            ),
        ]
    )
    return pipe.fit(train)


def score_returns(model, feats: DataFrame, keys: list[str]) -> DataFrame:
    """Batch inference over a feature table: keys + prediction."""
    return model.transform(feats).select(
        *keys, F.col("prediction").alias("prediction")
    )


# ---------------------------------------------------------------------------
# Embedding clustering (MLlib KMeans surface beyond the IVF internals)


def cluster_embeddings(
    emb: DataFrame,
    k: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """KMeans segmentation of an embedding table: returns
    (id, cluster). array<float> -> ml Vector via array_to_vector
    (JVM-side, no Python); deterministic under a fixed seed +
    k-means|| init."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        ),
    )
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(vecs)
    return model.transform(vecs).select(
        id_col, F.col("prediction").alias("cluster")
    )


def word2vec_neighbors(
    docs: DataFrame,
    probe: str,
    top_n: int = 5,
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Fit Word2Vec on tokenized documents and return the ``top_n``
    nearest tokens to ``probe`` as (word, similarity). The distributed
    skip-gram fit is MLlib's; numPartitions=1 keeps the result
    deterministic for a fixed seed (the standard reproducibility
    trade: at corpus scale raise numPartitions and accept run-to-run
    embedding jitter)."""
    from pyspark.ml.feature import Word2Vec

    toks = docs.select(
        F.filter(
            F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda w: w != F.lit("")
        ).alias("toks")
    )
    model = Word2Vec(
        inputCol="toks",
        outputCol="vec",
        vectorSize=16,
        minCount=2,
        seed=seed,
        numPartitions=1,
    ).fit(toks)
    return model.findSynonyms(probe, top_n)


def als_recommendations(
    events: DataFrame,
    top_n: int = 3,
    rank: int = 8,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """Implicit-feedback ALS recommender over the events stream: users
    interact with items (the ``props.k`` facet), interaction counts
    become confidence weights (Hu/Koren/Volinsky ICDM'08 — the model
    MLlib's implicitPrefs implements), and each user gets ``top_n``
    ranked item recommendations.

    Scale shape: MLlib ALS is THE canonical distributed factorization —
    ratings are block-partitioned by user and item, each half-iteration
    shuffles only factor blocks (rank floats per entity, never the
    ratings matrix), and the normal equations solved per entity are
    rank x rank. The recommendForAllUsers top-k is a blocked
    cross-product pruned per block. Confidence = ln(1 + count) damps
    heavy-user skew the way the paper prescribes.

    Output: (user_id, item, rec_rank) — scores are solver-internal
    floats, deliberately excluded (rows-only query; structural pins in
    tests/test_ml_pipelines.py assert the lift over random of
    reconstructing held-in preferences).
    """
    from pyspark.ml.recommendation import ALS

    ratings = (
        events.select(
            F.col("user_id").cast("int").alias("user"),
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .groupBy("user", "item")
        .agg(F.log1p(F.count("*")).cast("float").alias("rating"))
    )
    model = ALS(
        rank=rank,
        maxIter=max_iter,
        seed=seed,
        implicitPrefs=True,
        alpha=10.0,
        regParam=0.1,
        coldStartStrategy="drop",
        userCol="user",
        itemCol="item",
        ratingCol="rating",
    ).fit(ratings)
    recs = model.recommendForAllUsers(top_n)
    return recs.select(
        F.col("user").cast("bigint").alias("user_id"),
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user_id",
        F.col("rec.item").cast("bigint").alias("item"),
        (F.col("pos") + 1).cast("int").alias("rec_rank"),
    )
