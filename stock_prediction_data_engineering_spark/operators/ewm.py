"""Exponentially-weighted smoothing (EMA / MACD) as a grouped-map
operator (SURVEY.md §2.10 D2 surface; reference domain README.md:46 —
the indicator family its lake feeds).

EMA is a per-key *recurrence* (y_t = (1-α)·y_{t-1} + α·x_t), the one
time-series shape Spark SQL windows genuinely cannot express (a ROWS
frame sees values, not the prior frame's output; a closed-form
pow-weighted sum is numerically unstable over long histories). The
idiomatic Spark mapping is ``applyInPandas``: hash-partition by key,
Arrow-batch each key's ordered history through pandas' C-implemented
``ewm`` kernel. State is O(1) per key and work is one pass over each
partition — the same shape as the as-of join, so it scales to 100 TB
the way any keyed shuffle does (AQE handles skewed keys).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewm_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    spans: Sequence[int],
    prefix: str = "ema",
) -> DataFrame:
    """Append ``{prefix}_{span}`` EMA columns (adjust=False recurrence,
    seeded at the first observation) for each span, per key group in
    ``order_cols`` order. Keeps every input column."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(f"{prefix}_{s}", DoubleType()) for s in spans]
    )
    order = list(order_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        for s in spans:
            pdf[f"{prefix}_{s}"] = pdf[value_col].ewm(span=s, adjust=False).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema=out_schema)


def macd_features(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """MACD per key: fast/slow EMAs of the value, their difference
    (macd), an EMA of that difference (the signal line — a recurrence
    over another recurrence's output, impossible in one SQL window),
    and the histogram. One grouped-map pass computes all five."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(c, DoubleType())
            for c in ("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist")
        ]
    )
    order = list(order_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        f = pdf[value_col].ewm(span=fast, adjust=False).mean()
        s = pdf[value_col].ewm(span=slow, adjust=False).mean()
        m = f - s
        sig = m.ewm(span=signal, adjust=False).mean()
        pdf["ema_fast"], pdf["ema_slow"], pdf["macd"] = f, s, m
        pdf["macd_signal"], pdf["macd_hist"] = sig, m - sig
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema=out_schema)
