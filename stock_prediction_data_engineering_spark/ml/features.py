"""Feature engineering + model fit for next-day return prediction —
the downstream workload the reference's lake exists to feed ("further
analysis ... SageMaker", reference README.md:46; north-star approach
"Spark DataFrame ETL + MLlib", BASELINE.json).

The feature stage is pure window algebra (lag returns, moving
averages, volatility) — all JVM-side, partitioned per company, no
Python in the hot path. The model stage is a standard MLlib Pipeline
(VectorAssembler -> StandardScaler -> LinearRegression); at 100 TB the
same pipeline runs unchanged, with the fit driven by MLlib's
distributed solvers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FEATURE_COLS = ["ret_1d", "ret_5d", "ma5_gap", "vol_10d", "volu_z"]


def bar_features(bars: DataFrame) -> DataFrame:
    """Per-company daily features + next-day-return label from an
    OHLCV table (company, bar_date, open, high, low, close, volume)."""
    w = Window.partitionBy("company").orderBy("bar_date")
    # try_divide: a flat window (zero lag price / zero stddev) yields a
    # null feature, and na.drop quarantines the row — never a crash
    ret = lambda n: F.try_divide(F.col("close"), F.lag("close", n).over(w)) - 1  # noqa: E731
    ma5 = F.avg("close").over(w.rowsBetween(-4, 0))
    vol10 = F.stddev_samp(
        F.try_divide(F.col("close"), F.lag("close", 1).over(w)) - 1
    ).over(w.rowsBetween(-9, 0))
    vmean = F.avg("volume").over(w.rowsBetween(-9, 0))
    vstd = F.stddev_samp("volume").over(w.rowsBetween(-9, 0))
    return (
        bars.select(
            "company",
            "bar_date",
            "close",
            "volume",
            ret(1).alias("ret_1d"),
            ret(5).alias("ret_5d"),
            (F.try_divide(F.col("close"), ma5) - 1).alias("ma5_gap"),
            vol10.alias("vol_10d"),
            F.try_divide(F.col("volume") - vmean, vstd).alias("volu_z"),
            (F.try_divide(F.lead("close", 1).over(w), F.col("close")) - 1).alias("label"),
        )
        .na.drop(subset=[*FEATURE_COLS, "label"])
    )


def fit_return_model(features: DataFrame):
    """Fit the MLlib pipeline; returns (model, rmse-on-train)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features"),
            LinearRegression(featuresCol="features", labelCol="label", regParam=0.01),
        ]
    )
    model = pipe.fit(features)
    pred = model.transform(features)
    rmse = RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    ).evaluate(pred)
    return model, rmse


def score_rmse(model, features: DataFrame) -> float:
    """Held-out RMSE of a fitted return model on a feature table."""
    from pyspark.ml.evaluation import RegressionEvaluator

    pred = model.transform(features)
    return RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    ).evaluate(pred)
