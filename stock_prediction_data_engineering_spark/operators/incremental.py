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
        # until_version pins the delta to the watermark we are about
        # to record — a commit racing in after list_versions() must
        # not be absorbed now (it would be re-absorbed next sync)
        delta = snapshot_changes(
            spark, table_path, since_version=last, until_version=latest
        )
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


def sync_join_view_from_snapshots(
    spark,
    left_path: str,
    right_path: str,
    view_path: str,
    on: list[str],
) -> DataFrame:
    """Incrementally maintain a materialized INNER equi-join view of
    two snapshot tables (sources/snapshots.py).

    The classic delta rule for append-only sources:

        ΔJ = ΔA ⨝ B_new  ∪  A_old ⨝ ΔB

    (which equals ΔA⨝B_old ∪ ΔA⨝ΔB ∪ A_old⨝ΔB — every new pair has a
    new row on at least one side, counted exactly once). The commit
    log supplies every term for free: ΔA/ΔB via ``snapshot_changes``,
    A_old via time travel at the view's recorded watermark. Per-sync
    cost is O(Δ ⨝ counterpart) — never a re-join of full A × B.

    The view is ITSELF a snapshot table whose manifest carries the
    source-table watermarks (``extra_meta``), so delta + watermark
    publish in one atomic commit: a crash mid-sync leaves the old
    watermarks visible and the retry recomputes the same delta.

    Non-key columns of the two tables must be disjoint (standard
    materialized-join constraint). If a source history was rewritten
    (overwrite/upsert commits), the incremental feed raises — the view
    then rebuilds honestly from a full recompute, published as one
    overwrite commit with fresh watermarks.
    """
    import os

    from ..sources.snapshots import (
        _load_manifest,
        list_versions,
        snapshot_changes,
        snapshot_read,
        snapshot_write,
    )

    la = (list_versions(left_path) or [0])[-1]
    lb = (list_versions(right_path) or [0])[-1]

    view_versions = list_versions(view_path) if os.path.isdir(view_path) else []
    if view_versions:
        extra = _load_manifest(view_path, view_versions[-1]).get("extra", {})
        va, vb = extra.get("left_version", 0), extra.get("right_version", 0)
    else:
        va = vb = 0

    def full_rebuild() -> None:
        # every read is PINNED to the recorded watermark (la, lb): a
        # commit racing in after list_versions() must not leak into
        # the view data with an older watermark recorded, or the next
        # sync re-appends those rows as delta (duplicates). The racing
        # commit is simply the next sync's delta.
        j = snapshot_read(spark, left_path, version=la).join(
            snapshot_read(spark, right_path, version=lb), on, "inner"
        )
        snapshot_write(
            j.localCheckpoint(eager=True),
            view_path,
            mode="overwrite",
            extra_meta={"left_version": la, "right_version": lb},
        )

    if (la, lb) != (va, vb):
        if not view_versions:
            full_rebuild()
        else:
            try:
                delta_parts = []
                if la > va:
                    d_a = snapshot_changes(
                        spark, left_path, since_version=va, until_version=la
                    )
                    delta_parts.append(
                        d_a.join(
                            snapshot_read(spark, right_path, version=lb),
                            on,
                            "inner",
                        )
                    )
                if lb > vb:
                    d_b = snapshot_changes(
                        spark, right_path, since_version=vb, until_version=lb
                    )
                    a_old = (
                        snapshot_read(spark, left_path, version=va)
                        if va > 0
                        else spark.createDataFrame(
                            [], snapshot_read(spark, left_path).schema
                        )
                    )
                    delta_parts.append(a_old.join(d_b, on, "inner"))
                if not delta_parts:
                    # (la,lb) != (va,vb) but neither side advanced: a
                    # source table regressed below the watermark
                    # (deleted and recreated) — incremental deltas are
                    # meaningless, rebuild from the current sources
                    full_rebuild()
                else:
                    delta = delta_parts[0]
                    for p in delta_parts[1:]:
                        delta = delta.unionByName(p)
                    snapshot_write(
                        delta.localCheckpoint(eager=True),
                        view_path,
                        mode="append",
                        extra_meta={"left_version": la, "right_version": lb},
                    )
            except ValueError:
                # a source history was rewritten; incremental deltas
                # are invalid — rebuild from scratch
                full_rebuild()

    return snapshot_read(spark, view_path)
