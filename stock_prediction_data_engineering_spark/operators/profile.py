"""Table profiling: per-column statistics in one scan — the ANALYZE /
statistics-collection primitive an engine runs to feed its optimizer
(row counts, null counts, NDVs, min/max) and a data-quality monitor
runs to catch drift.

Output is long format (one row per column) so the profile of a
1000-column table is still one narrow result, and profiles of
different tables union cleanly.

Scale notes: everything folds into ONE aggregate over one scan; the
exact ``countDistinct`` per column plans an Expand (input ×n_cols
rows before partial aggregation) — the exact form is what an oracle
can check, and is fine into the tens of columns; at 100 TB with wide
tables swap ``exact_ndv=False`` to use ``approx_count_distinct``
(HLL++, no Expand), which drops the oracle but keeps the scan single.
Min/max are canonicalized per dtype (numerics to integer cents,
dates/strings to ISO strings) so the profile is engine-portable —
raw double→string formatting is NOT (Java prints 1.2345678E7 where
others print 12345678.0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canon(col: str, dtype: str) -> Column:
    """Engine-portable canonical form for min/max: exact integer cents
    for fractional numerics, the value itself for integers, ISO string
    casts for dates/strings/timestamps."""
    c = F.col(col)
    if dtype in ("double", "float") or dtype.startswith("decimal"):
        return (c.cast("decimal(18,4)") * 100).cast("bigint")
    return c


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """Per-column profile of ``df``: (col_name, n_rows, n_nulls,
    n_distinct, min_v, max_v) — min/max as strings of the canonical
    per-dtype form (see :func:`_canon`). One aggregate, one scan."""
    dtypes = dict(df.dtypes)
    names = cols if cols is not None else list(df.columns)

    aggs: list[Column] = [F.count("*").alias("__n_rows")]
    for c in names:
        canon = _canon(c, dtypes[c])
        ndv = (
            F.count_distinct(F.col(c))
            if exact_ndv
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            ndv.alias(f"__ndv_{c}"),
            F.min(canon).cast("string").alias(f"__min_{c}"),
            F.max(canon).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    stack_args: list[str] = []
    for c in names:
        stack_args += [
            f"'{c}'",
            "__n_rows",
            f"__n_rows - __cnt_{c}",
            f"__ndv_{c}",
            f"__min_{c}",
            f"__max_{c}",
        ]
    stacked = wide.selectExpr(
        f"stack({len(names)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_v, max_v)"
    )
    return stacked.select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_v",
        "max_v",
    )
