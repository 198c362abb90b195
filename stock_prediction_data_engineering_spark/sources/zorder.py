"""Z-order (Morton-curve) clustering for multi-column data skipping.

``write_lake(sort_cols=...)`` clusters row groups on ONE leading
column: its min/max footer stats become selective, but a predicate on
any other column still touches every row group. Interleaving the bits
of several columns into one Morton key and range-sorting on it gives
every participating column partial locality — a point/range filter on
ANY of them skips most row groups (the property Delta/Iceberg OPTIMIZE
ZORDER provides; here as plain Spark expressions, no table format).

Everything is JVM-side column arithmetic: one min/max aggregate per
z-column (tiny, driver-collected like any range-partitioner bound),
then normalization + bit interleaving in whole-stage codegen, then a
range repartition + in-partition sort on the key. No UDFs, no extra
shuffle beyond the one the clustered write needs anyway.

Reference parity: the reference has no multi-column layout tooling;
this extends SURVEY.md §4's "file-skipping stats" row to composite
predicates at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalized(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) as a long."""
    span = (hi - lo) or 1.0
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * F.lit((1 << bits) - 1)).cast("long")


def _interleave(normed: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    b * n_cols + i. n_cols * bits must stay < 63."""
    n = len(normed)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(normed):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return key


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Morton key column over ``cols`` (numeric / date /
    timestamp — dates and timestamps are cast through epoch numbers).
    Returns (df_with_key, key_column_name). Collects one 1-row min/max
    aggregate to fix the normalization bounds (same cost class as a
    range partitioner's sampling pass)."""
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds long range")

    def as_num(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        if dt == "date":
            return F.unix_date(F.col(c)).cast("double")
        if dt.startswith("timestamp"):
            # unix_micros requires TIMESTAMP; TIMESTAMP_NTZ (Spark 4.1+
            # parquet NANOS reads) casts through it. The tz offset is a
            # constant shift, which the min/max normalization cancels,
            # so key ordering is identical either way.
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        return F.col(c).cast("double")

    stats = df.agg(
        *[F.min(as_num(c)).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(as_num(c)).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    normed = [
        _normalized(as_num(c), stats[f"lo_{i}"], stats[f"hi_{i}"], bits)
        for i, c in enumerate(cols)
    ]
    key_col = "__zorder_key"
    return df.withColumn(key_col, _interleave(normed, bits)), key_col


def cluster_by_zorder(
    df: DataFrame, cols: list[str], num_files: int, bits: int = 16
) -> DataFrame:
    """Z-order-cluster ``df`` for writing: range-partition on the
    Morton key into ``num_files`` slices, sort within each slice, drop
    the key. Write the result with plain ``.write.parquet`` (or
    ``write_lake(files_per_partition=None)``) — row-group min/max
    stats on every participating column become selective."""
    keyed, key_col = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(num_files, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
