"""Walk-forward backtesting splits — time-series-correct train/eval
for the lake's downstream models.

Random K-fold leaks the future into training for ordered data; the
correct protocol is walk-forward: train on everything up to a cutoff,
evaluate on the next window, advance. Splits here are DATE-boundary
predicates (no shuffles, no materialization): each fold is a pair of
filter-pushed views over the same feature table, so the parquet scan
prunes to the fold's range and the full table is never copied.

Reference parity: the reference stops at lake construction and names
SageMaker as the downstream (reference README.md:46); this provides
the evaluation harness that downstream implies.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Fold:
    fold: int
    train_end: object   # exclusive date boundary
    test_end: object    # exclusive date boundary
    train: DataFrame
    test: DataFrame


def walk_forward_splits(
    df: DataFrame,
    date_col: str,
    n_folds: int = 3,
    min_train_fraction: float = 0.4,
) -> list[Fold]:
    """Split ``df`` into ``n_folds`` walk-forward folds on date
    boundaries: fold i trains on [t0, b_i) and tests on [b_i, b_{i+1}),
    where the boundaries divide the span after an initial training
    run-in of ``min_train_fraction``. One min/max aggregate total; the
    folds themselves are lazy filtered views."""
    lo, hi = df.agg(
        F.min(date_col).alias("lo"), F.max(date_col).alias("hi")
    ).first()
    if lo is None:
        return []
    span_days = (hi - lo).days if hasattr(hi - lo, "days") else int(hi - lo)
    run_in = int(span_days * min_train_fraction)
    step = max(1, (span_days - run_in) // n_folds)

    folds = []
    for i in range(n_folds):
        train_end = F.date_add(F.lit(lo), run_in + i * step)
        test_end = (
            F.date_add(F.lit(lo), run_in + (i + 1) * step)
            if i < n_folds - 1
            else F.date_add(F.lit(hi), 1)  # last fold absorbs the tail
        )
        train = df.filter(F.col(date_col) < train_end)
        test = df.filter(
            (F.col(date_col) >= train_end) & (F.col(date_col) < test_end)
        )
        folds.append(Fold(i, train_end, test_end, train, test))
    return folds


def walk_forward_rmse(
    feats: DataFrame, date_col: str = "bar_date", n_folds: int = 3
) -> list[tuple[int, float]]:
    """Fit the return model per fold and report held-out RMSE — the
    honest (no-future-leak) generalization estimate."""
    from .features import fit_return_model, score_rmse

    out = []
    for f in walk_forward_splits(feats, date_col, n_folds):
        if f.train.head(1) and f.test.head(1):
            model, _train_rmse = fit_return_model(f.train)
            out.append((f.fold, score_rmse(model, f.test)))
    return out
