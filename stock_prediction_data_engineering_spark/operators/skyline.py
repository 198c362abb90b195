"""Two-phase distributed 2-D skyline (Pareto frontier).

A point dominates another if it is no worse on both dimensions and
strictly better on at least one. The textbook query is the quadratic
NOT EXISTS self-join; this operator computes the identical result
with data-sized work only in KEYED windows:

1. **Local prune** — rows are hash-grouped (any grouping is sound: a
   point dominated within its group is dominated globally, and a
   global skyline point survives every group it could land in). Each
   group's skyline falls out of two windows over the group:
   ``max(maximize) RANGE UNBOUNDED PRECEDING .. 1 PRECEDING`` on the
   minimize axis (best rival among strictly-better rows) and
   ``max(maximize)`` at the same minimize value (same-price rival).
2. **Global verify** — the surviving candidates (union of local
   frontiers — frontier-sized, tiny relative to the input) are
   broadcast and dominance-filtered pairwise with a left-anti join.

At 100 TB step 1 is the only data-sized pass and uses keyed shuffles
only; step 2's candidate set is bounded by the sum of local frontier
sizes, not row count.

No reference-repo counterpart (reference
dags/stock_data_airflow_local_aws_s3.py is a 131-line ingest DAG);
north-star analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRP = "__sky_grp"


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """All rows not dominated on (minimize low, maximize high).

    ``minimize`` must be numeric (the RANGE frame needs an ordinal
    axis). Duplicate points are all retained — the skyline is a
    filter, not a dedup.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    first = df.columns[0]
    grp = df.withColumn(_GRP, F.pmod(F.xxhash64(*df.columns), F.lit(par)))
    w_lt = (
        Window.partitionBy(_GRP)
        .orderBy(minimize)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(_GRP, minimize)
    local = (
        grp.withColumn("__max_lt", F.max(maximize).over(w_lt))
        .withColumn("__max_eq", F.max(maximize).over(w_eq))
        .filter(
            (F.col("__max_lt").isNull() | (F.col("__max_lt") < F.col(maximize)))
            & (F.col(maximize) == F.col("__max_eq"))
        )
        .select(*df.columns)
    )
    a = local.alias("a")
    b = local.select(
        F.col(minimize).alias("__b_min"), F.col(maximize).alias("__b_max")
    ).alias("b")
    dominated = (
        (F.col("__b_min") <= F.col(f"a.{minimize}"))
        & (F.col("__b_max") >= F.col(f"a.{maximize}"))
        & (
            (F.col("__b_min") < F.col(f"a.{minimize}"))
            | (F.col("__b_max") > F.col(f"a.{maximize}"))
        )
    )
    return a.join(F.broadcast(b), dominated, "left_anti").select(*df.columns)
