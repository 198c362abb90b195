"""MLlib pipeline surface (ml/pipelines.py + queries/ml_models.py):
time-series-safe CV, text classification, clustering, and the
numpy-pinned OLS batch scorer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def feats(spark):
    from stock_prediction_data_engineering_spark.ml.features import bar_features
    from stock_prediction_data_engineering_spark.sources.lake import (
        ohlcv_from_events,
    )

    return bar_features(ohlcv_from_events(spark, SF_SMOKE)).cache()


def test_ols_scorer_matches_numpy_closed_form(spark, feats):
    """solver="normal" + regParam=0 is exact least squares: the
    distributed fit must reproduce the closed-form numpy solution —
    coefficients and held-out predictions to float precision."""
    from stock_prediction_data_engineering_spark.ml.backtest import (
        walk_forward_splits,
    )
    from stock_prediction_data_engineering_spark.ml.features import FEATURE_COLS
    from stock_prediction_data_engineering_spark.ml.pipelines import (
        fit_return_scorer,
        score_returns,
    )

    fold = walk_forward_splits(feats, "bar_date", n_folds=1)[0]
    model = fit_return_scorer(fold.train, FEATURE_COLS)

    tr = fold.train.select(*FEATURE_COLS, "label").toPandas()
    X = np.column_stack([tr[c].to_numpy() for c in FEATURE_COLS])
    X1 = np.column_stack([X, np.ones(len(X))])
    beta, *_ = np.linalg.lstsq(X1, tr["label"].to_numpy(), rcond=None)

    lr = model.stages[-1]
    got = np.append(np.array(lr.coefficients), lr.intercept)
    assert np.allclose(got, beta, atol=1e-8), (got, beta)

    te = fold.test.select("company", "bar_date", *FEATURE_COLS).toPandas()
    want = (
        np.column_stack([te[c].to_numpy() for c in FEATURE_COLS]) @ beta[:-1]
        + beta[-1]
    )
    pred = (
        score_returns(model, fold.test, ["company", "bar_date"])
        .orderBy("company", "bar_date")
        .toPandas()
    )
    te = te.sort_values(["company", "bar_date"]).reset_index(drop=True)
    want = (
        np.column_stack([te[c].to_numpy() for c in FEATURE_COLS]) @ beta[:-1]
        + beta[-1]
    )
    assert np.allclose(pred["prediction"].to_numpy(), want, atol=1e-8)


def test_walk_forward_cv_selects_min_mean_and_refits(spark, feats):
    """The CV loop evaluates every param setting on every fold, picks
    the minimum mean metric, and refits that setting on all data; each
    candidate fit only ever sees data before its validation window
    (walk-forward protocol, inherited from backtest splits)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from stock_prediction_data_engineering_spark.ml.features import FEATURE_COLS
    from stock_prediction_data_engineering_spark.ml.pipelines import (
        walk_forward_cv,
    )

    def build(params):
        return Pipeline(
            stages=[
                VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
                LinearRegression(
                    featuresCol="features",
                    labelCol="label",
                    solver="normal",
                    regParam=params["regParam"],
                ),
            ]
        )

    grid = [{"regParam": v} for v in (0.0, 0.1, 10.0)]
    model, best, results = walk_forward_cv(
        feats, grid, build, date_col="bar_date", n_folds=2
    )
    assert len(results) == len(grid)
    assert all(len(r["fold_metrics"]) == len(results[0]["fold_metrics"])
               for r in results)
    assert best == min(results, key=lambda r: r["mean"])["params"]
    # refit model scores the full table
    assert model.transform(feats).select("prediction").count() == feats.count()


def test_doc_classifier_predicts_known_labels(spark):
    """The HashingTF/IDF/LogReg pipeline round-trips label indexing:
    predictions are real label strings, and training accuracy beats
    the majority class (the fit learned SOMETHING separable)."""
    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.ml.pipelines import (
        fit_doc_classifier,
        score_doc_classifier,
    )

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    model = fit_doc_classifier(docs, label_col="lang")
    scored = score_doc_classifier(model, docs, label_col="lang")

    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    preds = {r.predicted for r in scored.select("predicted").distinct().collect()}
    assert preds <= langs

    n = docs.count()
    majority = (
        docs.groupBy("lang").count().agg(F.max("count")).first()[0] / n
    )
    acc = scored.filter(F.col("predicted") == F.col("lang")).count() / n
    assert acc >= majority, (acc, majority)


def test_kmeans_clusters_partition_the_embeddings(spark):
    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.ml.pipelines import (
        cluster_embeddings,
    )

    emb = table(spark, SF_SMOKE, "embeddings")
    assigned = cluster_embeddings(emb, k=8, seed=42)
    n = emb.count()
    assert assigned.count() == n                      # total partition
    assert assigned.select("vec_id").distinct().count() == n
    k_used = assigned.select("cluster").distinct().count()
    assert 1 < k_used <= 8


def test_registered_ml_queries_run(spark):
    """The four rows-only model queries run at smoke scale with stable
    schemas and non-empty output (the driver's rows-only contract)."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    expect = {
        "q_model_scoring": {"company", "bar_date", "prediction"},
        "q_doc_classify": {"lang", "predicted", "n"},
        "q_kmeans_clusters": {"cluster", "n", "n_labels"},
        "q_word2vec_neighbors": {"word", "similarity"},
    }
    for name, cols in expect.items():
        df = registry.QUERIES[name](spark, SF_SMOKE)
        assert set(df.columns) == cols, name
        assert df.count() > 0, name


def test_pca_variance_matches_numpy(spark):
    """MLlib's explained-variance shares must match a closed-form
    numpy covariance eigendecomposition on the same vectors (float
    tolerance — different eigensolvers, same spectrum)."""
    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.catalog import table

    registry.load_all()
    got = {
        r.component: r.explained_var_bp
        for r in registry.QUERIES["q_pca_variance"](spark, SF_SMOKE).collect()
    }
    X = np.array(
        [
            r.embedding
            for r in table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    cov = np.cov(X, rowvar=False, ddof=1)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
    share = eig / eig.sum()
    assert len(got) == 5
    for i in range(5):
        assert abs(got[i] - share[i] * 10000) <= 2, (i, got[i], share[i])
    # shares are non-increasing in component order
    vals = [got[i] for i in range(5)]
    assert vals == sorted(vals, reverse=True)


def test_als_recommender_reconstructs_preferences(spark):
    """Implicit ALS must beat the random baseline at reconstructing
    held-in preferences: the fraction of recommended items the user
    actually interacted with exceeds the expected hit rate of uniform
    random recommendations by a pinned margin (measured 0.76 vs 0.49
    on the sf0.001 fixture), and the output is structurally sound
    (top-3 per user, ranks 1..3, items from the catalog)."""
    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.ml.pipelines import (
        als_recommendations,
    )

    ev = table(spark, SF_SMOKE, "events")
    recs = als_recommendations(ev, top_n=3).toPandas()

    inter = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
        .toPandas()
    )
    iset = inter.groupby("user_id").item.apply(set).to_dict()
    catalog = set(inter.item)

    per_user = recs.groupby("user_id").size()
    assert (per_user == 3).all()
    assert set(recs.rec_rank) == {1, 2, 3}
    assert set(recs.item) <= catalog

    hits = sum(1 for r in recs.itertuples() if r.item in iset[r.user_id])
    hit_rate = hits / len(recs)
    random_rate = inter.groupby("user_id").item.nunique().mean() / len(catalog)
    assert hit_rate >= 0.65
    assert hit_rate > random_rate + 0.1


def test_isotonic_matches_sequential_pava(spark):
    """MLlib's distributed parallel-PAVA on the pooled score table must
    equal the unique sequential pool-adjacent-violators solution
    computed in numpy: same score domain, identical fitted rates
    (exact weighted averages of 0/1 labels), and monotone
    non-decreasing in the score."""
    from stock_prediction_data_engineering_spark.registry import ordered_queries

    got = (
        ordered_queries()["q_isotonic_calibration"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("pred_bp")
        .reset_index(drop=True)
    )

    from stock_prediction_data_engineering_spark.catalog import table

    u = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "n_views"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .select(
            F.expr("(n_views * 10000) div (n_views + 5)").alias("pred_bp"),
            "converted",
        )
        .toPandas()
    )
    pooled = (
        u.groupby("pred_bp")
        .converted.agg(["count", "mean"])
        .reset_index()
        .sort_values("pred_bp")
    )
    # sequential PAVA: pool adjacent violators until monotone
    vals = list(pooled["mean"])
    wts = list(pooled["count"].astype(float))
    blocks = [[v, w, 1] for v, w in zip(vals, wts)]  # value, weight, n_pts
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-12:
            v = (
                blocks[i][0] * blocks[i][1]
                + blocks[i + 1][0] * blocks[i + 1][1]
            ) / (blocks[i][1] + blocks[i + 1][1])
            blocks[i] = [v, blocks[i][1] + blocks[i + 1][1],
                         blocks[i][2] + blocks[i + 1][2]]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    want = np.repeat([b[0] for b in blocks], [b[2] for b in blocks])

    assert got.pred_bp.tolist() == pooled.pred_bp.tolist()
    assert got.n_users.tolist() == pooled["count"].tolist()
    got_rate = got.iso_rate_bp.to_numpy() / 10000.0
    assert np.allclose(got_rate, want, atol=1e-4)  # bp quantization
    assert (np.diff(got.iso_rate_bp.to_numpy()) >= 0).all()
