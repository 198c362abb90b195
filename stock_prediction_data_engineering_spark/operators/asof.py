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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, annotated with the payload
    of the nearest ``right`` row per key — at-or-before its timestamp
    (``direction="backward"``, the default) or at-or-after it
    (``direction="forward"``). ``tolerance`` (an SQL interval string
    like ``'2 hours'``, or a number for numeric timestamps) nulls the
    payload when the matched row is further away than that — the
    pandas ``merge_asof`` surface, distributed.

    Both directions are the same single-shuffle union+window plan; the
    forward variant just scans the per-key timeline in reverse.

    right side must be unique per (key, ts) — pre-aggregate it if not,
    otherwise "which same-timestamp row wins" is nondeterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    right_ts_type = right.schema[right_ts].dataType
    aligned_left = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(_LEFT).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_payload],
        F.lit(None).cast(right_ts_type).alias("__match_ts"),
    )
    aligned_right = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(_RIGHT).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
        F.col(right_ts).alias("__match_ts"),
    )

    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_names = [*[f"{c}{suffix}" for c in right_payload], "__match_ts"]
    filled: list[Column] = [
        F.last(F.col(n), ignorenulls=True).over(w).alias(n) for n in fill_names
    ]

    out = (
        aligned_left.unionByName(aligned_right)
        .select(*keys, "__ts", "__side", *left_cols, *filled)
        .filter(F.col("__side") == _LEFT)
    )
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        gap = (
            F.col("__ts") - F.col("__match_ts")
            if direction == "backward"
            else F.col("__match_ts") - F.col("__ts")
        )
        within = F.col("__match_ts").isNotNull() & (gap <= tol)
        out = out.select(
            *keys,
            "__ts",
            "__side",
            *left_cols,
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_payload
            ],
        )
    return out.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_cols,
        *[f"{c}{suffix}" for c in right_payload],
    )
