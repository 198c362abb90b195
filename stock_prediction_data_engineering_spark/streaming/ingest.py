"""Streaming dedup ingest: the full incremental corpus-admission loop
as one streaming operator (the composition R28 + R29 exist for).

Per micro-batch of arriving documents:

1. batch-internal near-dup resolution — MinHash pairs + connected
   components keep one canonical doc per within-batch cluster;
2. probe the persisted MinHash index — survivors that near-duplicate
   ANY previously admitted doc are dropped;
3. admit the remainder: append to the corpus lake AND to the index
   (``minhash_index_write(mode="append")``), so batch N+1's probe sees
   batch N's admissions.

Everything heavy is the batch operators (operators/dedup.py) run on a
bounded micro-batch inside ``foreachBatch`` — no second dedup
implementation, and per-batch cost is the O(batch) probe path measured
in tools/scale_sweep_dedup.py, never a corpus re-dedup.

Exactly-once note: foreachBatch gives at-least-once; the loop makes a
replayed batch converge instead of double-admitting (round-8):

- the index probe runs with ``include_self=True``, so a re-delivered
  doc matches its own already-indexed row (same id, jaccard 1.0) and
  the whole replay drops at the probe once the MinHash append has
  committed;
- with ``snapshot_lake=True`` the lake commit carries the
  ``(txn_app, epoch_id)`` transaction tag, so a replay that reaches
  the lake step anyway (crash BETWEEN lake commit and index append)
  skips the already-published commit instead of appending twice;
- the MinHash index append runs LAST: it is the replay detector, so
  every other effect must be durable before it commits. A crash
  before it leaves a replay that re-runs the earlier steps — the lake
  skips via the txn tag and the substring index tolerates the benign
  double-append (its probe dedups ids).

With the plain parquet lake (``snapshot_lake=False``) the
crash-between-lake-and-index window can still double-append the lake
— full replay idempotence needs the snapshot lake's commit tags.
Full-batch replays (the common lost-checkpoint case) are no-ops in
both modes, pinned by tests/test_snapshots.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_index_probe,
    minhash_index_write,
    minhash_lsh_pairs,
    resolve_duplicates,
)


def start_dedup_ingest(
    docs: DataFrame,
    index_path: str,
    lake_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    snapshot_lake: bool = False,
    substring_index_path: str | None = None,
    substring_min_shared: int = 1,
    txn_app: str = "dedup-ingest",
):
    """Start the admission stream. ``docs`` must carry (id_col,
    text_col). The index directory may be absent (cold start): the
    first batch then skips the probe and seeds it. Returns the
    StreamingQuery.

    ``snapshot_lake=True`` publishes each batch's admissions through
    the snapshot commit log (sources/snapshots.py) instead of a plain
    parquet append: downstream readers see each admission batch
    atomically and can tail ``snapshot_changes`` — e.g. to keep a
    corpus-stats view current via
    ``operators/incremental.sync_view_from_snapshots``.

    ``substring_index_path`` adds the orthogonal VERBATIM-overlap
    screen (operators/winnow.py): survivors sharing an exact run of
    >= 31 chars with any admitted doc are rejected even when their
    Jaccard is far below the near-dup threshold — the quote/
    boilerplate contamination the set-similarity probe cannot see.
    Admissions then append to BOTH indexes, so batch N+1 is screened
    against batch N on both axes. Same O(batch) probe discipline
    (bucket-pruned scan, broadcast batch)."""

    def _admit(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # 1) within-batch dedup: canonical survivors only
        pairs = minhash_lsh_pairs(
            batch,
            text_col=text_col,
            id_col=id_col,
            jaccard_threshold=jaccard_threshold,
        )
        survivors = (
            resolve_duplicates(batch, pairs, id_col=id_col)
            .filter("is_canonical")
            .select(batch.columns)
        )
        # 2) cross-batch dedup: drop anything the corpus already has.
        # include_self: a replayed batch matches its own indexed rows
        # id-for-id — those hits make the replay a no-op (module note)
        if os.path.isdir(f"{index_path}/bands"):
            hits = minhash_index_probe(
                survivors,
                index_path,
                text_col=text_col,
                id_col=id_col,
                jaccard_threshold=jaccard_threshold,
                include_self=True,
            ).select(F.col("new_id").alias(id_col)).distinct()
            survivors = survivors.join(hits, id_col, "left_anti")
        # 2b) cross-batch verbatim screen (optional, orthogonal axis)
        if substring_index_path is not None and os.path.isdir(
            f"{substring_index_path}/fps"
        ):
            from ..operators.winnow import winnow_index_probe

            sub_hits = (
                winnow_index_probe(
                    survivors,
                    substring_index_path,
                    id_col=id_col,
                    text_col=text_col,
                    min_shared=substring_min_shared,
                )
                .select(F.col("new_id").alias(id_col))
                .distinct()
            )
            survivors = survivors.join(sub_hits, id_col, "left_anti")
        # one deterministic materialization: admitted rows feed both
        # the lake append and the index append
        survivors = survivors.localCheckpoint(eager=True)
        # 3) admit
        if survivors.isEmpty():
            return
        if snapshot_lake:
            from ..sources.snapshots import snapshot_write

            # txn tag: a replay that re-reaches this step after a
            # crash-between-lake-and-index skips the duplicate commit
            snapshot_write(
                survivors, lake_path, mode="append", txn=(txn_app, epoch_id)
            )
        else:
            survivors.write.mode("append").parquet(lake_path)
        # appends in crash-safety order: the MinHash index commits
        # LAST because its probe is the replay detector — everything
        # it would suppress on replay must already be durable
        if substring_index_path is not None:
            from ..operators.winnow import winnow_index_write

            winnow_index_write(
                survivors,
                substring_index_path,
                id_col=id_col,
                text_col=text_col,
                mode="append",
            )
        minhash_index_write(
            survivors,
            index_path,
            text_col=text_col,
            id_col=id_col,
            mode="append",
        )

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(_admit)
        .trigger(availableNow=True)
        .start()
    )


def start_snapshot_sink(
    docs: DataFrame,
    table_path: str,
    partition_cols: tuple[str, ...] = (),
    checkpoint: str | None = None,
    txn_app: str = "snapshot-sink",
):
    """Stream micro-batches into a snapshot-versioned table
    (sources/snapshots.py): every micro-batch publishes as ONE atomic
    commit, so downstream readers either see a whole batch or none of
    it — the visibility guarantee the plain ``mode("append")`` parquet
    sink cannot give (readers listing mid-write see partial files) —
    and incremental consumers pick up exactly the new batches via
    ``snapshot_changes(since_version)``.

    Exactly-once: foreachBatch delivery is at-least-once, so each
    commit carries the transaction tag ``(txn_app, epoch_id)`` and
    ``snapshot_write`` SKIPS a tag already in the published log (the
    Delta txnAppId/txnVersion pattern) — a batch re-delivered after a
    crash-between-commit-and-checkpoint becomes a no-op and the
    visible table is exactly-once (replay-pinned in
    tests/test_streaming.py). Streams from DIFFERENT sources writing
    into one table must pass distinct ``txn_app`` ids — epoch ids are
    per-checkpoint, and two streams sharing the default app id would
    silently drop each other's same-numbered epochs. Returns the
    StreamingQuery."""
    from ..sources.snapshots import snapshot_write

    def _commit(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        snapshot_write(
            batch,
            table_path,
            mode="append",
            partition_cols=partition_cols,
            txn=(txn_app, epoch_id),
        )

    w = docs.writeStream.outputMode("append").foreachBatch(_commit)
    if checkpoint is not None:
        # source progress survives restarts: a resumed stream processes
        # only files it has not yet committed (the batch-level half of
        # exactly-once; replay of an in-flight batch remains possible)
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def start_cdc_apply(
    changes: DataFrame,
    table_path: str,
    key_cols: tuple[str, ...],
    seq_cols: tuple[str, ...],
    op_col: str = "op",
    delete_op: str = "delete",
    checkpoint: str | None = None,
):
    """Stream a CDC changelog into a snapshot-versioned table: each
    micro-batch is collapsed to its latest op per key and MERGEd
    (upserts + deletes, operators/cdc.py) as ONE atomic overwrite
    commit via ``snapshot_apply_changes``.

    Cross-batch correctness needs no state: within a batch the seq
    collapse picks the winner; across batches, a later batch's change
    simply merges over the earlier batch's result — the same final
    table as collapsing the concatenated feed, PROVIDED the source
    delivers each key's changes in seq order across batches (true for
    ordered feeds: Kafka per-key partitions, CDC log readers). The
    equivalence is asserted in tests/test_streaming.py.

    Exactly-once note: replaying a batch re-merges the same winners —
    upserts and deletes are idempotent per (key, seq), so the visible
    table is unchanged (an extra version appears in the history).
    Returns the StreamingQuery."""
    from ..sources.snapshots import snapshot_apply_changes

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        snapshot_apply_changes(
            batch,
            table_path,
            key_cols=key_cols,
            seq_cols=seq_cols,
            op_col=op_col,
            delete_op=delete_op,
        )

    w = changes.writeStream.outputMode("append").foreachBatch(_merge)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()
