"""Calendar resampling / gap-fill for per-key time series.

The reference's lake is daily OHLCV bars keyed by (company, date);
markets skip weekends/holidays and fetches skip failures, so any
downstream daily-frequency model first regularizes the calendar:
every key gets a row for every day in its span, with missing days
forward-filled from the last observation (SURVEY.md §2.5 domain).

Spark-native shape, one shuffle + one window:

1. per key, min/max date (hash aggregate);
2. ``sequence(min, max, interval 1 day)`` + ``explode`` — the
   calendar spine is generated JVM-side, sized by span not by data;
3. left join observations back onto the spine (same key partitioning);
4. forward-fill with ``last(col, ignorenulls=True)`` over the per-key
   date-ordered window — O(1) state per key, AQE-skew-eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_gapfill(
    observed: DataFrame,
    key_cols: list[str],
    date_col: str,
    fill_cols: list[str],
    step_days: int = 1,
) -> DataFrame:
    """Regularize a per-key daily series: emit one row per key per
    ``step_days`` between that key's first and last observation, with
    ``fill_cols`` forward-filled (null until first observation) and
    ``is_observed`` marking real rows."""
    spine = (
        observed.groupBy(*key_cols)
        .agg(F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"interval {step_days} day")
                )
            ).alias(date_col),
        )
    )
    joined = spine.join(
        observed.withColumn("__obs", F.lit(True)), [*key_cols, date_col], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        date_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
        F.coalesce("__obs", F.lit(False)).alias("is_observed"),
    )
