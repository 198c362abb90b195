"""Change-data-capture apply: fold an ordered changelog of
upserts/deletes into a keyed base table (the MERGE INTO shape every
lakehouse table format exposes).

The reference's roadmap ends at "daily stock data updates" (reference
README.md:10,49) — i.e. exactly this operator: yesterday's lake plus
today's changed rows. `sources/snapshots.py::snapshot_upsert` covers
the upsert-only special case; real CDC feeds (Debezium-style) also
carry deletes and multiple changes per key per batch, which must be
collapsed to the LATEST change by a total sequence order before
merging — applying them row-by-row in feed order would be
order-dependent across partitions.

Scale shape: one per-key window over the changelog (sized by the
batch, not the table), one left-anti join base-vs-changed-keys, one
union. The join hashes on the merge key; with the base stored
partitioned/bucketed on that key, only the buckets containing changed
keys rewrite (copy-on-write MERGE).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """Collapse a changelog to one winner row per key: the row with
    the highest (seq_cols) tuple. seq_cols must totally order each
    key's changes (CDC feeds guarantee this via LSN/offset); the
    ordering is descending on every seq column."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE a changelog into ``base``: per key, the latest change
    wins — a delete removes the row, anything else replaces it (or
    inserts, for keys new to the base). Base rows with no change pass
    through untouched.

    ``changes`` must carry the base's columns (the upsert payload)
    plus ``op_col`` and ``seq_cols``; extra columns are dropped on
    output, which always has exactly the base schema.
    """
    keys = list(key_cols)
    winners = latest_changes(changes, keys, seq_cols)
    untouched = base.join(
        winners.select(*keys).distinct(), keys, "left_anti"
    )
    # NULL op must be handled explicitly: `op != 'delete'` evaluates
    # NULL to NULL and would drop the row AFTER its key was already
    # anti-joined out of base — a malformed changelog row silently
    # deleting data. Unknown ops are treated as upserts instead.
    upserts = winners.filter(
        F.col(op_col).isNull() | (F.col(op_col) != delete_op)
    ).select(*base.columns)
    return untouched.unionByName(upserts)
