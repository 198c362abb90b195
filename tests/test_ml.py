"""MLlib feature/model pipeline over lake-derived OHLCV bars — the
'stock prediction' downstream the reference's lake feeds."""

from __future__ import annotations

from conftest import SF_SMOKE


def test_bar_features_and_model(spark):
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.ml.features import (
        FEATURE_COLS,
        bar_features,
        fit_return_model,
    )
    from stock_prediction_data_engineering_spark.sources.lake import ohlcv_from_events

    bars = ohlcv_from_events(spark, SF_SMOKE)
    feats = bar_features(bars)

    # features exist, are finite, and the plan stays per-company
    # partitioned (no single-partition window cliff)
    assert feats.count() > 0
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    row = feats.select(
        *[F.count(F.when(F.isnan(c) | F.col(c).isNull(), 1)).alias(c) for c in FEATURE_COLS]
    ).collect()[0]
    assert all(row[c] == 0 for c in FEATURE_COLS)

    # label sanity: next-day return of the last day per company is
    # dropped (no peeking past the frame)
    last = bars.groupBy("company").agg(F.max("bar_date").alias("bar_date"))
    leaked = feats.join(last, ["company", "bar_date"], "left_semi")
    assert leaked.count() == 0

    model, rmse = fit_return_model(feats)
    assert rmse >= 0.0
    pred = model.transform(feats)
    assert pred.select("prediction").na.drop().count() == feats.count()


def test_walk_forward_backtest(spark):
    """Walk-forward splits: train always strictly precedes its test
    window, test windows tile the post-run-in span without overlap,
    and the per-fold held-out RMSE harness runs end to end."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.ml.backtest import (
        walk_forward_rmse,
        walk_forward_splits,
    )
    from stock_prediction_data_engineering_spark.ml.features import bar_features
    from stock_prediction_data_engineering_spark.sources.lake import ohlcv_from_events

    feats = bar_features(ohlcv_from_events(spark, SF_SMOKE))
    folds = walk_forward_splits(feats, "bar_date", n_folds=3)
    assert len(folds) == 3

    total_rows = feats.count()
    seen_test = 0
    for f in folds:
        max_train = f.train.agg(F.max("bar_date")).first()[0]
        min_test = f.test.agg(F.min("bar_date")).first()[0]
        if max_train is not None and min_test is not None:
            assert max_train < min_test  # never trains on the future
        seen_test += f.test.count()
        # train grows monotonically (walk-forward, not sliding)
        if f.fold > 0:
            assert f.train.count() >= folds[f.fold - 1].train.count()
    assert 0 < seen_test < total_rows

    scores = walk_forward_rmse(feats, n_folds=3)
    assert scores and all(r >= 0.0 for (_i, r) in scores)


def test_quantile_sketch_brackets_exact_percentile(spark):
    """The sqrt-histogram sketch's [lo_c, hi_c] bucket bounds must
    bracket the exact percentile value, and the bucket's relative
    width must be within the documented ~2/sqrt(v) bound."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.catalog import table
    from stock_prediction_data_engineering_spark.queries.stats import (
        q_quantile_sketch,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r["pct"]: r for r in q_quantile_sketch(spark, sf).collect()}
    assert set(rows) == {50, 90, 99}

    v = (
        table(spark, sf, "orders")
        .select((F.col("o_totalprice").cast("decimal(18,4)") * 100)
                .cast("bigint").alias("v_c"))
    )
    n = v.count()
    exact = sorted(r.v_c for r in v.collect())
    for pct, r in rows.items():
        # exact percentile as the smallest value with cum count >= p%*n
        idx = -(-pct * n // 100)  # ceil
        ev = exact[idx - 1]
        assert r["lo_c"] <= ev <= r["hi_c"], (pct, ev, r)
        width = r["hi_c"] - r["lo_c"]
        assert width <= 2 * (r["bucket"] + 1), (pct, width, r)
