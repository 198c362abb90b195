"""Snapshot-versioned lake tables: a minimal commit log over parquet
(the Iceberg/Delta idea, reduced to what the incremental-ingest loop
here actually needs — atomic appends, time travel, and incremental
change reads).

Why the plain Hive lake isn't enough (SURVEY.md §2.1 S3/S4 +
reference README.md:10,49 "daily updates" roadmap): a reader that
lists a directory while a writer is mid-append sees half a commit;
re-running a failed append double-counts; and "what arrived since I
last looked" requires remembering file sets externally. A tiny
manifest log fixes all three:

    table/
      _snapshots/v000001.json   <- manifest: list of commit dirs
      _snapshots/v000002.json
      commit-000001/...parquet  <- immutable data files (may be
      commit-000002/...parquet     Hive-partitioned inside)

- Each commit writes its data files into a fresh ``commit-{N}/``
  directory (never touching previous commits), then publishes the
  manifest ``v{N}.json`` with O_CREAT|O_EXCL — the atomic commit
  point. A crash before publish leaves an orphan data dir (cleaned
  lazily) and NO visible change; a concurrent writer racing to the
  same version loses the exclusive create and retries on top of the
  winner (optimistic concurrency).
- Readers resolve the highest published version (or an explicit one —
  time travel) and read exactly the dirs its manifest lists. Readers
  never see a partial commit.
- The manifest lists commit DIRECTORIES, not files, so it stays tiny
  at any scale (file listing happens partition-pruned at scan time);
  version metadata records row/file counts for audit.

Local-filesystem primitives (os.rename / O_EXCL) are used directly,
matching the harness; on an object store the same protocol runs over
conditional PUTs (S3 If-None-Match) — documented, out of harness.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


def _snap_dir(path: str) -> str:
    return os.path.join(path, _SNAPDIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:06d}.json")


def list_versions(path: str) -> list[int]:
    """Published snapshot versions, ascending (empty if none)."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = (),
    compression: str = "snappy",
    max_retries: int = 5,
    extra_meta: dict | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Commit ``df`` to the snapshot table at ``path``; returns the new
    version number.

    ``mode="append"``: the new snapshot is previous dirs + this
    commit's dir. ``mode="overwrite"``: the new snapshot is this
    commit's dir alone (old files stay on disk for time travel until
    :func:`expire_snapshots`).

    The data write happens BEFORE the version is claimed, into a
    directory named by pid+counter (unique per attempt), so a lost
    commit race re-publishes the already-written files under the next
    version instead of rewriting data.

    ``txn=(app_id, epoch)`` makes the commit IDEMPOTENT per
    application transaction (the Delta ``txnAppId``/``txnVersion``
    pattern): the tag rides the manifest, and a commit whose tag
    already appears in the published log is SKIPPED (the existing
    version is returned, no data written). This is what upgrades an
    at-least-once ``foreachBatch`` re-delivery into an exactly-once
    visible table — a replayed (stream, epoch) pair hits the recorded
    tag and becomes a no-op. The check re-runs inside the optimistic
    retry loop, so a concurrent replayer that wins the version race
    is seen before this writer publishes a duplicate.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_snap_dir(path), exist_ok=True)

    def _txn_committed() -> int | None:
        if txn is None:
            return None
        app, epoch = txn
        for v in list_versions(path):
            m = _load_manifest(path, v)
            t = m.get("txn")
            if t and t.get("app") == app and t.get("epoch") == epoch:
                return v
        return None

    already = _txn_committed()
    if already is not None:
        return already

    # unique, never-published staging dir for this attempt's data
    # files. The name must be claimed ATOMICALLY (os.mkdir, not an
    # exists-check) — concurrent writer THREADS share the pid, and a
    # check-then-write race would land two writers in one dir.
    attempt = 0
    while True:
        commit_dir = f"commit-{os.getpid():05d}-{attempt:03d}"
        full = os.path.join(path, commit_dir)
        try:
            os.mkdir(full)
            break
        except FileExistsError:
            attempt += 1

    # "overwrite" because the claimed dir exists (and is empty) — no
    # other writer can hold this name
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(full)
    n_files = sum(
        1
        for _root, _dirs, files in os.walk(full)
        for f in files
        if f.endswith(".parquet")
    )

    import threading

    for retry in range(max_retries):
        versions = list_versions(path)
        if retry > 0:
            # a lost race may have been a concurrent replay of OUR txn —
            # re-check before publishing a duplicate on top of it
            already = _txn_committed()
            if already is not None:
                shutil.rmtree(full, ignore_errors=True)
                return already
        new_version = (versions[-1] + 1) if versions else 1
        if mode == "append" and versions:
            prev = _load_manifest(path, versions[-1])
            dirs = list(prev["dirs"]) + [commit_dir]
        else:
            dirs = [commit_dir]
        manifest = {
            "version": new_version,
            "mode": mode,
            "dirs": dirs,
            "added_dir": commit_dir,
            "n_files_added": n_files,
            "partition_cols": list(partition_cols),
        }
        if txn is not None:
            manifest["txn"] = {"app": txn[0], "epoch": txn[1]}
        if extra_meta:
            # caller metadata rides the manifest, so it commits in the
            # SAME atomic publish as the data (e.g. the join-view
            # maintainer's source-table watermarks,
            # operators/incremental.py)
            manifest["extra"] = extra_meta
        # the tmp name must be unique per WRITER AND ATTEMPT, not just
        # per process: concurrent threads share the pid, and two
        # racers for the same version with one shared tmp path would
        # overwrite each other's manifest bytes (publishing the loser's
        # dir list under the winner's version) or unlink the tmp out
        # from under the other's os.link
        tmp = (
            _manifest_path(path, new_version)
            + f".tmp.{os.getpid()}.{threading.get_ident()}.{retry}"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            # atomic publish: exclusive create of the version file.
            # os.link(tmp, final) fails with EEXIST if a concurrent
            # writer already claimed this version — we then retry on
            # top of the winner's manifest (optimistic concurrency).
            os.link(tmp, _manifest_path(path, new_version))
            os.unlink(tmp)
            return new_version
        except FileExistsError:
            os.unlink(tmp)
            continue
    raise RuntimeError(
        f"snapshot_write lost {max_retries} commit races at {path}"
    )


def _read_dirs(spark: SparkSession, path: str, dirs: list[str]) -> DataFrame:
    from functools import reduce

    dfs = [spark.read.parquet(os.path.join(path, d)) for d in dirs]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Each commit
    dir is its own partition-discovered parquet read (pruning intact);
    commits union by name, so later schema additions read as nulls on
    old commits (additive schema evolution)."""
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    return _read_dirs(spark, path, _load_manifest(path, v)["dirs"])


def snapshot_changes(
    spark: SparkSession,
    path: str,
    since_version: int,
    until_version: int | None = None,
) -> DataFrame:
    """Rows added AFTER ``since_version`` up to ``until_version``
    (default: latest) — the incremental-consumption feed (appends
    only; an overwrite commit resets history, and this raises so the
    consumer re-syncs from a full read instead of silently missing the
    rewrite). Consumers that record a watermark must pass it as
    ``until_version`` so a commit racing in between their version
    listing and this read is excluded and picked up next sync."""
    versions = list_versions(path)
    newer = [
        v
        for v in versions
        if v > since_version
        and (until_version is None or v <= until_version)
    ]
    added: list[str] = []
    for v in newer:
        m = _load_manifest(path, v)
        if m.get("extra", {}).get("compaction"):
            # a compaction rewrites FILES, not DATA (Delta's
            # dataChange=false): the change feed skips it, and the
            # append dirs it superseded remain readable until
            # expire_snapshots reclaims them. A consumer that lags
            # past an expire re-syncs from a full read — same
            # contract as vacuuming under a streaming reader.
            continue
        if m["mode"] != "append":
            raise ValueError(
                f"version {v} is {m['mode']!r}; incremental read only "
                "spans append commits — re-sync from snapshot_read"
            )
        added.append(m["added_dir"])
    if not added:
        return spark.createDataFrame(
            [], schema=snapshot_read(spark, path).schema
        )
    return _read_dirs(spark, path, added)


def snapshot_compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_cols: tuple[str, ...] = (),
) -> int | None:
    """Rewrite the latest snapshot's accumulated commit dirs into one
    compacted dir and publish it as a new version — the OPTIMIZE /
    small-file-management half of the lakehouse (streaming appends
    produce one dir per micro-batch; at 100 TB the scan dies of file
    listing and per-file open overhead long before it dies of bytes).

    ``zorder_cols`` upgrades the repack to OPTIMIZE ZORDER (round-8):
    output files are Morton-clustered on those columns
    (sources/zorder.py — range partition on the interleaved key + sort
    within each file), so row-group min/max footer stats become
    selective for predicates on ANY participating column, not just a
    lucky leading sort column. Costs the one range shuffle the
    clustering needs (the plain repack stays shuffle-free); same
    dataChange=false commit semantics either way.

    Semantics: data is UNCHANGED (Delta's dataChange=false) — the
    manifest carries ``extra.compaction`` so :func:`snapshot_changes`
    skips the commit and incremental consumers never see a phantom
    full-table re-append. Old versions stay time-travelable until
    :func:`expire_snapshots` reclaims the superseded dirs.

    Concurrency: the compacted manifest publishes CONDITIONALLY at
    exactly ``base_version + 1`` via the same O_EXCL link primitive —
    if any commit (append or otherwise) wins that version, the
    compaction ABORTS (returns None, staged files removed) instead of
    publishing a snapshot that silently drops the racer's rows. The
    caller just re-runs compaction later; aborting is always safe
    because compaction adds no data.

    Output sizing: ``coalesce(ceil(input_bytes / target_file_bytes))``
    — a narrow, shuffle-free repack (compaction must not pay a shuffle
    of the whole table).

    Returns the new version, or None if there was nothing to compact
    or the conditional publish lost a race.
    """
    import math

    versions = list_versions(path)
    if not versions:
        return None
    base = versions[-1]
    m = _load_manifest(path, base)
    if len(m["dirs"]) <= 1:
        return None  # already compact
    total_bytes = 0
    for d in m["dirs"]:
        for root, _dirs, files in os.walk(os.path.join(path, d)):
            total_bytes += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = _read_dirs(spark, path, m["dirs"])
    if zorder_cols:
        from .zorder import cluster_by_zorder

        df = cluster_by_zorder(df, list(zorder_cols), n_out)
    else:
        df = df.coalesce(n_out)

    attempt = 0
    while True:
        commit_dir = f"commit-{os.getpid():05d}-{attempt:03d}"
        full = os.path.join(path, commit_dir)
        try:
            os.mkdir(full)
            break
        except FileExistsError:
            attempt += 1
    w = df.write.mode("overwrite")
    pcols = tuple(m.get("partition_cols", ()))
    if pcols:
        w = w.partitionBy(*pcols)
    w.parquet(full)
    n_files = sum(
        1
        for _root, _dirs, files in os.walk(full)
        for f in files
        if f.endswith(".parquet")
    )

    import threading

    new_version = base + 1
    manifest = {
        "version": new_version,
        "mode": "overwrite",
        "dirs": [commit_dir],
        "added_dir": commit_dir,
        "n_files_added": n_files,
        "partition_cols": list(pcols),
        "extra": {"compaction": True, "compacted_from": base,
                  "n_dirs_compacted": len(m["dirs"]),
                  **({"zorder_cols": list(zorder_cols)} if zorder_cols else {})},
    }
    tmp = (
        _manifest_path(path, new_version)
        + f".tmp.{os.getpid()}.{threading.get_ident()}"
    )
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, _manifest_path(path, new_version))
        os.unlink(tmp)
        return new_version
    except FileExistsError:
        # a concurrent commit claimed base+1: abort — publishing at a
        # later version would drop that commit's rows from the view
        os.unlink(tmp)
        shutil.rmtree(full, ignore_errors=True)
        return None


def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` manifests and delete data
    dirs no surviving manifest references (the storage-reclaim half of
    time travel). Returns the expired version numbers."""
    versions = list_versions(path)
    if len(versions) <= keep_last:
        return []
    expired = versions[:-keep_last]
    survivors = versions[-keep_last:]
    live: set[str] = set()
    for v in survivors:
        live.update(_load_manifest(path, v)["dirs"])
    for v in expired:
        os.unlink(_manifest_path(path, v))
    for d in os.listdir(path):
        if d.startswith("commit-") and d not in live:
            shutil.rmtree(os.path.join(path, d))
    return expired


def snapshot_upsert(
    updates: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Keyed MERGE against the snapshot table: rows in ``updates``
    replace current rows with the same key; new keys insert. Publishes
    ONE overwrite commit of the merged state — the previous version
    stays readable (time travel shows the pre-merge table), and the
    change is atomic: concurrent readers see either the old or the new
    version, never a half-merged table.

    This is copy-on-write MERGE (like streaming/upsert.py's lake form,
    but with the commit log supplying atomicity + history instead of
    directory swaps). Cost is O(table) per call — right for periodic
    batch merges; for per-key-grain updates at 100 TB, partition the
    table and merge per partition, or stage deltas via append commits
    and compact on read.
    """
    spark = updates.sparkSession
    keys = list(key_cols)
    current = snapshot_read(spark, path)
    merged = current.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    ).unionByName(updates)
    # the merged plan reads the files the overwrite commit will
    # supersede — materialize rows before publishing the new version
    merged = merged.localCheckpoint(eager=True)
    return snapshot_write(
        merged, path, mode="overwrite", partition_cols=partition_cols
    )


def snapshot_apply_changes(
    changes: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
    seq_cols: tuple[str, ...],
    op_col: str = "op",
    delete_op: str = "delete",
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Full CDC MERGE against the snapshot table: collapse ``changes``
    to the latest op per key (operators/cdc.py), then upsert/delete in
    one atomic overwrite commit. Generalizes :func:`snapshot_upsert`
    (which is the no-deletes, pre-collapsed special case); the same
    copy-on-write cost note applies. Time travel keeps the pre-merge
    version readable, so a bad CDC batch is recoverable by re-merging
    from the prior version."""
    from ..operators.cdc import apply_changes

    spark = changes.sparkSession
    current = snapshot_read(spark, path)
    merged = apply_changes(
        current,
        changes,
        key_cols=key_cols,
        seq_cols=seq_cols,
        op_col=op_col,
        delete_op=delete_op,
    )
    merged = merged.localCheckpoint(eager=True)
    return snapshot_write(
        merged, path, mode="overwrite", partition_cols=partition_cols
    )
