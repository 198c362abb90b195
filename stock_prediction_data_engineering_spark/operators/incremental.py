"""Incremental aggregate maintenance: mergeable partial-aggregate
states, so a persisted rollup can absorb a new batch without
re-scanning history.

This is the 100 TB pattern behind materialized-view maintenance and
the reference's "future daily updates" roadmap
(/root/reference/README.md:49): the lake keeps one small state row per
key — (n, sum, min, max) is an algebraic aggregate, so
merge(state(A), state(B)) == state(A ∪ B) exactly — and each daily
batch costs one scan of the BATCH plus a keyed merge into state,
independent of total history size. Compare a naive rollup refresh,
which re-reads the full fact table every day.

Sums accumulate in DECIMAL(18,4) (exact for <=2-decimal inputs), so
merge order never changes results — the same discipline the
oracle-checked queries use. AVG derives at finalize as one double
division; variance-capable states would add sum-of-squares the same
way (see queries/stats.py q_anomaly_gate for the exact algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,4)"

STATE_COLS = ("n", "s", "mn", "mx")


def partial_agg(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Collapse a batch to one mergeable state row per key."""
    v = F.col(value_col).cast(DEC)
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(v).alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two state tables; associative and commutative, so any
    merge tree (daily batches, partial shuffles, region shards) yields
    the same state. One keyed aggregate over state rows — never the
    underlying facts."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").cast(DEC).alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing aggregate view from state: exact count /
    sum / min / max plus the one double division for the mean."""
    return state.select(
        *keys,
        F.col("n").alias("n_rows"),
        F.col("s").alias("total"),
        F.col("mn").alias("vmin"),
        F.col("mx").alias("vmax"),
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
    )


def sync_view_from_snapshots(
    spark,
    table_path: str,
    state_path: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Incremental materialized-view maintenance driven by the
    snapshot commit log (sources/snapshots.py): bring the persisted
    per-key aggregate state up to the table's latest version by
    scanning ONLY the append commits since the last sync, then return
    the finalized view.

    State lives at ``state_path/state-v{N}.parquet`` where N is the
    last applied table version — the version is IN the directory name,
    so state and watermark commit together (a crash mid-write leaves
    the old state dir intact; the half-written new dir is overwritten
    on retry). Old state dirs are pruned after a successful write.

    Cost per sync: O(delta) scan + one keyed merge against O(|keys|)
    state — independent of table history, the whole point. A non-
    append commit (overwrite/upsert) raises in snapshot_changes; the
    caller then rebuilds state from a full snapshot_read — the honest
    fallback, since arbitrary rewrites invalidate incremental deltas.
    """
    import os
    import re
    import shutil

    from ..sources.snapshots import list_versions, snapshot_changes

    os.makedirs(state_path, exist_ok=True)
    applied = [
        int(m.group(1))
        for f in os.listdir(state_path)
        if (m := re.fullmatch(r"state-v(\d+)\.parquet", f))
    ]
    last = max(applied, default=0)
    latest = (list_versions(table_path) or [0])[-1]

    if latest > last:
        delta = snapshot_changes(spark, table_path, since_version=last)
        delta_state = partial_agg(delta, keys, value_col)
        if last > 0:
            prev = spark.read.parquet(
                os.path.join(state_path, f"state-v{last}.parquet")
            )
            new_state = merge_states(prev, delta_state, keys)
        else:
            new_state = delta_state
        out = os.path.join(state_path, f"state-v{latest}.parquet")
        # materialize BEFORE the old state becomes deletable: the merge
        # plan reads the previous state's files
        new_state.localCheckpoint(eager=True).write.mode(
            "overwrite"
        ).parquet(out)
        for v in applied:
            if v != latest:
                shutil.rmtree(
                    os.path.join(state_path, f"state-v{v}.parquet"),
                    ignore_errors=True,
                )
        last = latest

    state = spark.read.parquet(
        os.path.join(state_path, f"state-v{last}.parquet")
    )
    return finalize(state, keys)
