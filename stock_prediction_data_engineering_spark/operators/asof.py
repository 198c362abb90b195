"""As-of join — the canonical time-series lookup for the reference's
OHLCV domain (SURVEY.md §2.3 J8): for each left row, the latest right
row with ``right.ts <= left.ts`` within the same key.

Spark SQL has no native ASOF JOIN. The scalable strategy here is the
union+window pattern:

1. align both sides into one schema with a ``side`` marker,
2. union (no shuffle yet),
3. one window ``partitionBy(key).orderBy(ts, side)`` with
   ``last(right_payload, ignorenulls=True)`` carrying the most recent
   right values forward,
4. keep the left rows.

Cost: a single hash-partition shuffle on the key + an in-partition
sort — the same cost profile as one sort-merge join, with no
broadcast-nested-loop blowup. This survives 100 TB because state per
key is O(1) during the forward fill and skew is bounded by key
cardinality (AQE skew handling applies to the exchange).

The alternative (range join + ``row_number() = 1``) is quadratic per
key and is deliberately not used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Right rows sort before left rows at equal timestamps, so a quote at
# exactly t is visible to a probe at t (ASOF "backward" semantics,
# matching DuckDB's `ON left.ts >= right.ts`).
_RIGHT, _LEFT = 0, 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, annotated with the payload
    of the latest ``right`` row at-or-before its timestamp, per key.

    right side must be unique per (key, ts) — pre-aggregate it if not,
    otherwise "which same-timestamp row wins" is nondeterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    aligned_left = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(_LEFT).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_payload],
    )
    aligned_right = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(_RIGHT).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_payload
    ]

    return (
        aligned_left.unionByName(aligned_right)
        .select(*keys, "__ts", "__side", *left_cols, *filled)
        .filter(F.col("__side") == _LEFT)
        .select(*keys, F.col("__ts").alias(left_ts), *left_cols, *[f"{c}{suffix}" for c in right_payload])
    )
