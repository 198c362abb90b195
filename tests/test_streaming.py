"""Structured Streaming smoke tests (SURVEY.md §2.12 T2-T5): the same
window builders that power the batch queries, driven as real streams
through the memory sink; plus the foreachBatch upsert that models the
reference's daily-update roadmap."""

from __future__ import annotations

import shutil
import tempfile

from conftest import SF_SMOKE

_STAGE_DIR = None


def _stream_events(spark):
    """events table as a bounded stream. Spark's FileStreamSource
    monitors a *directory*, and the testdata dir is read-only with one
    file per table — so stage events.parquet into a tmp dir once."""
    global _STAGE_DIR
    if _STAGE_DIR is None:
        _STAGE_DIR = tempfile.mkdtemp(prefix="stream_events_")
        shutil.copy(f"{SF_SMOKE}/events.parquet", _STAGE_DIR)
    from stock_prediction_data_engineering_spark.catalog import normalize_ts

    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(_STAGE_DIR)
    # ts arrives reader-dependent (nanos-long or TIMESTAMP_NTZ); the
    # shared normalizer lands it as TIMESTAMP for watermarks/window()
    return normalize_ts(stream)


def _batch_events(spark):
    from stock_prediction_data_engineering_spark.catalog import normalize_ts

    return normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))


def _run_to_completion(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_tumbling_with_watermark(spark):
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.windows import (
        tumbling_agg,
        with_watermark,
    )

    agg = tumbling_agg(with_watermark(_stream_events(spark), "1 hour"))
    _run_to_completion(agg, "tumbling_out")
    out = spark.sql("SELECT * FROM tumbling_out")
    # append mode emits only watermark-closed windows; the final
    # (open) window is withheld — that's the semantics, not a bug
    assert out.count() > 0
    assert out.count() <= tumbling_agg(_batch_events(spark)).count()


def test_streaming_session_window(spark):
    from stock_prediction_data_engineering_spark.streaming.windows import (
        session_agg,
        with_watermark,
    )

    agg = session_agg(with_watermark(_stream_events(spark), "1 hour"))
    _run_to_completion(agg, "session_out")
    assert spark.sql("SELECT * FROM session_out").count() > 0


def test_streaming_stateful_dedup(spark):
    from stock_prediction_data_engineering_spark.streaming.windows import stateful_dedup

    deduped = stateful_dedup(_stream_events(spark), "2 hours")
    _run_to_completion(deduped, "dedup_out")
    # distinct aggregation isn't allowed inside a stream — check the
    # sunk rows in batch: no duplicate ids survive
    row = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS n_ids FROM dedup_out"
    ).collect()[0]
    assert row.n > 0 and row.n == row.n_ids


def test_stream_stream_interval_join(spark):
    """Watermarked stream-stream self-join: every event pairs with the
    same user's events in the preceding 30 minutes. Verified against
    the identical batch-mode range join."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.joins import interval_join

    left = _stream_events(spark).select("user_id", "ts", "event_id")
    right = (
        _stream_events(spark)
        .select(
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_event_id"),
        )
    )
    lw = left.withWatermark("ts", "1 hour")
    rw = right.withWatermark("r_ts", "1 hour")
    joined = lw.join(
        rw,
        (lw.user_id == rw.user_id_r)
        & (rw.r_ts >= lw.ts - F.expr("INTERVAL 30 minutes"))
        & (rw.r_ts <= lw.ts),
        "inner",
    ).select("user_id", "event_id", "r_event_id")
    _run_to_completion(joined, "ssj_out")
    got = spark.sql("SELECT count(*) AS n FROM ssj_out").collect()[0].n

    batch = _batch_events(spark)
    b = batch.select("user_id", "ts", "event_id")
    r = batch.select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    want = b.join(
        r,
        (b.user_id == r.user_id_r)
        & (r.r_ts >= b.ts - F.expr("INTERVAL 30 minutes"))
        & (r.r_ts <= b.ts),
    ).count()
    assert got == want > 0

    # the operator wrapper builds the same plan
    l2 = _stream_events(spark).select("user_id", "ts", "event_id")
    r2 = _stream_events(spark).select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    wrapped = interval_join(
        l2,
        r2,
        key="user_id",
        left_ts="ts",
        right_ts="r_ts",
        interval="30 minutes",
        watermark="1 hour",
    ).select("user_id", "event_id", "r_event_id")
    _run_to_completion(wrapped, "ssj_wrapped_out")
    assert spark.sql("SELECT count(*) AS n FROM ssj_wrapped_out").collect()[0].n == want


def test_stream_static_enrichment(spark):
    """Stream-static join: enrich the event stream with the customer
    dimension (broadcast lookup, stateless)."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.joins import enrich_with_dim

    dim = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    enriched = enrich_with_dim(
        _stream_events(spark).select("user_id", "event_id"), dim, on="user_id"
    )
    _run_to_completion(enriched, "enrich_out")
    out = spark.sql("SELECT * FROM enrich_out")
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert out.count() == n_events
    # every event whose user exists in the dim got a segment
    matched = out.filter("c_mktsegment IS NOT NULL").count()
    assert matched > 0


def test_foreach_batch_upsert(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.upsert import upsert_batch

    lake = str(tmp_path_factory.mktemp("upsert")) + "/bars"

    day1 = spark.createDataFrame(
        [("AAA", "2024-01-01", 10.0), ("BBB", "2024-01-01", 20.0)],
        "company string, bar_date string, close double",
    )
    upsert_batch(spark, day1, lake, keys=["company", "bar_date"])
    assert spark.read.parquet(lake).count() == 2

    # day-2 batch: revises AAA/2024-01-01 and appends a new day
    day2 = spark.createDataFrame(
        [("AAA", "2024-01-01", 11.5), ("AAA", "2024-01-02", 12.0)],
        "company string, bar_date string, close double",
    )
    upsert_batch(spark, day2, lake, keys=["company", "bar_date"])
    final = spark.read.parquet(lake)
    assert final.count() == 3
    revised = final.filter(
        (F.col("company") == "AAA") & (F.col("bar_date") == "2024-01-01")
    ).collect()[0]
    assert revised.close == 11.5  # update won over the old row
    shutil.rmtree(lake, ignore_errors=True)


def test_apply_in_pandas_with_state_running_stats(spark, tmp_path_factory):
    """Cross-batch state: split events into several files, stream them
    one file per micro-batch, and check the final per-key running
    stats equal the batch ground truth."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.stateful import running_stats

    src = str(tmp_path_factory.mktemp("stateful_src"))
    batch = _batch_events(spark)
    batch.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)

    emissions = []

    def capture(df, epoch_id):
        emissions.append((epoch_id, df.toPandas()))

    q = (
        running_stats(stream)
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(emissions) > 1  # state really crossed micro-batches
    final = {}
    for _, pdf in sorted(emissions, key=lambda t: t[0]):
        for row in pdf.itertuples():
            final[row.key] = (row.n_events, row.sum_value, row.min_value, row.max_value)

    truth = {
        r["key"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in batch.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    for k in truth:
        assert final[k][0] == truth[k][0]
        assert abs(final[k][1] - truth[k][1]) < 1e-6 * max(1.0, abs(truth[k][1]))
        assert final[k][2] == truth[k][2] and final[k][3] == truth[k][3]


def test_continuous_rollup_matches_batch(spark, tmp_path_factory):
    """Stream events in several micro-batches into an upserted rollup
    table; the final table must equal the one-shot batch rollup."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.rollup import (
        start_continuous_rollup,
    )
    from stock_prediction_data_engineering_spark.streaming.windows import tumbling_agg

    root = tmp_path_factory.mktemp("rollup")
    src = str(root / "src")
    batch = _batch_events(spark)
    # stage time-ordered arrival: 4 chronological slices with ordered
    # mtimes, so no row is older than the already-advanced watermark
    # (out-of-order rows beyond the delay are *supposed* to be dropped
    # — that divergence from batch is the watermark contract, tested in
    # test_streaming_tumbling_with_watermark)
    import os
    import time as _time

    os.makedirs(src)
    pdf = batch.toPandas().sort_values("ts").reset_index(drop=True)
    # keep µs precision: datetime64[ns] would round-trip as
    # TIMESTAMP(NANOS), which the session surfaces as a long
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    now = _time.time()
    for i, part in enumerate(
        [pdf.iloc[j : j + (len(pdf) + 3) // 4] for j in range(0, len(pdf), (len(pdf) + 3) // 4)]
    ):
        p = f"{src}/slice-{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, times=(now + i, now + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # pandas parquet is TIMESTAMP_NTZ; watermarks need TIMESTAMP
        # (equal values — session TZ is pinned UTC)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    rollup_path = str(root / "rollup")
    q = start_continuous_rollup(stream, rollup_path)
    q.awaitTermination()

    got = spark.read.parquet(rollup_path)
    want = tumbling_agg(batch)
    # identical (window, type) -> (count, sum) contents
    diff = got.unionByName(want).groupBy(
        "win_start", "win_end", "event_type", "n_events", "sum_value"
    ).count().filter("count != 2")
    assert diff.count() == 0
    assert got.count() == want.count()


def test_streaming_macd_matches_batch(spark, tmp_path_factory):
    """Indicator maintenance across micro-batches: stream the events
    table in three time-ordered files and check every emitted MACD row
    is bit-identical to the batch recurrence over the full history
    (the prepend-continuation argument in streaming/indicators.py)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.ewm import macd_features
    from stock_prediction_data_engineering_spark.streaming.indicators import (
        streaming_macd,
    )

    src = str(tmp_path_factory.mktemp("macd_src"))
    batch = _batch_events(spark).select("user_id", "event_id", "ts", "value")
    pdf = batch.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(src, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]]), path)
        os.utime(path, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emissions = []

    def capture(df, epoch_id):
        emissions.append((epoch_id, df.toPandas()))

    q = (
        streaming_macd(stream)
        .writeStream.outputMode("append")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len([e for _, e in emissions if len(e)]) >= 3  # state crossed batches
    got = (
        pd.concat([e for _, e in emissions], ignore_index=True)
        .set_index("event_id")
        .sort_index()
    )
    assert len(got) == n

    truth = (
        macd_features(
            spark.createDataFrame(pdf), ["user_id"], ["ts", "event_id"], "value"
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    for col in ("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist"):
        diff = (got[col] - truth[col]).abs().max()
        assert diff < 1e-9, (col, diff)


def test_streaming_heavy_hitters_exact_at_capacity(spark, tmp_path_factory):
    """With capacity >= distinct keys per shard the sketch degenerates
    to exact per-key counts: the final emission must equal the batch
    groupBy count for every key."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.heavy_hitters import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path_factory.mktemp("hh_src"))
    batch = _batch_events(spark)
    batch.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    emissions = []

    def capture(df, epoch_id):
        emissions.append((epoch_id, df.toPandas()))

    q = (
        streaming_heavy_hitters(stream, capacity=5000, n_shards=4)
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(emissions) > 1  # state crossed micro-batches

    final = {}
    for _, pdf in sorted(emissions, key=lambda t: t[0]):
        for row in pdf.itertuples():
            final[row.key] = row.est_count
    truth = {
        r.user_id: r.cnt
        for r in batch.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert final == truth


def test_streaming_heavy_hitters_guarantees_under_pressure(spark, tmp_path_factory):
    """With a tiny capacity the summary is approximate but must keep
    the space-saving guarantees: every estimate >= the true count
    (over-count only, bounded by max_err), and every key whose true
    count exceeds its shard's N/capacity is present."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.heavy_hitters import (
        _shard_of,
        streaming_heavy_hitters,
    )

    n_shards, capacity = 2, 8
    src = str(tmp_path_factory.mktemp("hh_small_src"))
    batch = _batch_events(spark)
    batch.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    emissions = []

    def capture(df, epoch_id):
        emissions.append((epoch_id, df.toPandas()))

    q = (
        streaming_heavy_hitters(
            stream, capacity=capacity, n_shards=n_shards
        )
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = {}  # key -> (est, err)
    for _, pdf in sorted(emissions, key=lambda t: t[0]):
        for row in pdf.itertuples():
            final[row.key] = (row.est_count, row.max_err)

    truth_df = (
        batch.select(
            _shard_of(F.col("user_id"), n_shards).alias("shard"),
            F.col("user_id").cast("long").alias("key"),
        )
        .groupBy("shard", "key")
        .agg(F.count("*").alias("cnt"))
    )
    truth = {(r.shard, r.key): r.cnt for r in truth_df.collect()}
    shard_n = {}
    for (shard, _), cnt in truth.items():
        shard_n[shard] = shard_n.get(shard, 0) + cnt

    for (shard, key), cnt in truth.items():
        if key in final:
            est, err = final[key]
            assert est >= cnt, (key, est, cnt)  # over-count only
            assert est - err <= cnt  # err bounds the overshoot
        else:
            # absent keys must be below the guarantee threshold
            assert cnt <= shard_n[shard] / capacity, (key, cnt)


def test_streaming_pack_assignment_matches_batch(spark, tmp_path_factory):
    """Cross-batch packing: stream documents in doc_id-ordered slices;
    every emitted (pack_id, pack_offset) must equal the one-shot batch
    pack_assignment over the full corpus."""
    import os

    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.queries.llm_pipeline import (
        pack_assignment,
    )
    from stock_prediction_data_engineering_spark.streaming.packing import (
        streaming_pack_assignment,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    src = str(tmp_path_factory.mktemp("pack_src"))
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    os.makedirs(src, exist_ok=True)
    import time as _time

    now = _time.time()
    for i in range(3):
        p = f"{src}/slice-{i}.parquet"
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, times=(now + i, now + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emissions = []

    def capture(df, epoch_id):
        emissions.append((epoch_id, df.toPandas()))

    q = (
        streaming_pack_assignment(stream, capacity=256)
        .writeStream.outputMode("append")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len([e for _, e in emissions if len(e)]) >= 3  # state crossed batches

    import pandas as pd

    got = (
        pd.concat([e for _, e in emissions], ignore_index=True)
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == n

    truth = (
        pack_assignment(docs, "source", "doc_id", "n_tokens", 256)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for col in ("pack_id", "pack_offset"):
        assert (got[col] == truth[col]).all(), col


def test_streaming_asof_enrichment_matches_batch(spark, tmp_path_factory):
    """Per-micro-batch as-of enrichment against a static quote table
    must equal the one-shot batch as-of join — batch boundaries cannot
    change which reference row is latest-at-or-before an event."""
    import pandas as pd
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.asof import asof_join
    from stock_prediction_data_engineering_spark.streaming.asof import (
        start_asof_enrichment,
    )

    batch = _batch_events(spark)
    # reference: each user's click events as the 'quote' timeline
    ref = (
        batch.filter("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("quote_value"))
    )
    probes = batch.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )

    src = str(tmp_path_factory.mktemp("asof_src"))
    probes.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    emissions = []
    q = start_asof_enrichment(
        stream,
        ref,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["quote_value"],
        sink=lambda df, e: emissions.append(df.toPandas()),
    )
    q.awaitTermination()
    assert len([e for e in emissions if len(e)]) > 1  # really micro-batched

    got = (
        pd.concat(emissions, ignore_index=True)
        .set_index("event_id")
        .sort_index()[["quote_value_asof"]]
    )
    want = (
        asof_join(probes, ref, "user_id", "ts", "ts", ["quote_value"])
        .toPandas()
        .set_index("event_id")
        .sort_index()[["quote_value_asof"]]
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_streaming_dedup_ingest_admits_once(spark, tmp_path_factory):
    """The full admission loop: stream three document slices where
    slice 2 exactly re-sends half of slice 1 and slice 3 re-sends docs
    from both — the lake must end up with each distinct text admitted
    exactly once, and within-batch dup pairs collapse to canonicals."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.streaming.ingest import (
        start_dedup_ingest,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 120")
    )
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    s1 = pdf.iloc[:60]
    # slice 2: 30 fresh docs + re-sends of 30 slice-1 texts (new ids)
    s2 = pdf.iloc[60:90].copy()
    dup2 = s1.iloc[:30].copy()
    dup2["doc_id"] += 100000
    import pandas as pd

    s2 = pd.concat([s2, dup2], ignore_index=True)
    # slice 3: 30 fresh + re-sends from slices 1 and 2 (newer ids)
    s3 = pdf.iloc[90:120].copy()
    dup3 = pd.concat([s1.iloc[30:45], pdf.iloc[60:75]], ignore_index=True).copy()
    dup3["doc_id"] += 200000
    s3 = pd.concat([s3, dup3], ignore_index=True)

    root = tmp_path_factory.mktemp("ingest")
    src = str(root / "src")
    os.makedirs(src)
    now = _time.time()
    for i, part in enumerate((s1, s2, s3)):
        p = f"{src}/slice-{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, times=(now + i, now + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index_path = str(root / "index")
    lake_path = str(root / "lake")
    q = start_dedup_ingest(stream, index_path, lake_path)
    q.awaitTermination()

    from stock_prediction_data_engineering_spark.operators.dedup import (
        minhash_lsh_pairs,
        resolve_duplicates,
    )

    lake = spark.read.parquet(lake_path)
    # the re-sent copies (the +100000/+200000 ids) never landed —
    # exact re-sends are always jaccard-1.0 hits against the index
    assert lake.filter("doc_id >= 100000").count() == 0
    # the admitted lake is near-dup-free at the admission threshold:
    # the operator's core guarantee, regardless of arrival order
    assert minhash_lsh_pairs(lake, jaccard_threshold=0.7).count() == 0
    # every text with NO near-dup anywhere in the corpus (singleton
    # component in a global batch resolution) was admitted untouched
    global_pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.7)
    comp = resolve_duplicates(docs, global_pairs)
    singles = comp.groupBy("component").count().filter("count = 1")
    singleton_ids = {
        r.doc_id
        for r in comp.join(singles, "component").select("doc_id").collect()
    }
    admitted_ids = {r.doc_id for r in lake.select("doc_id").collect()}
    assert singleton_ids <= admitted_ids
    # and nothing beyond the original corpus appeared
    assert admitted_ids <= {r.doc_id for r in docs.select("doc_id").collect()}


def test_streaming_moments_match_batch_query(spark, tmp_path_factory):
    """Running moment statistics across micro-batches: the LAST
    emission per event_type must equal q_moment_stats over the full
    events table exactly — the power-sum state is order-free integer
    addition, so chunked evaluation IS batch evaluation."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.streaming.moments import (
        streaming_moments,
    )

    src = str(tmp_path_factory.mktemp("mom_src"))
    batch = _batch_events(spark).select("event_type", "ts", "value")
    pdf = batch.toPandas().sort_values("ts").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(src, f"part-{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]]), path
        )
        os.utime(path, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emissions = []

    def capture(df, epoch_id):
        emissions.append(df.toPandas())

    q = (
        streaming_moments(stream)
        .writeStream.outputMode("append")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len([e for e in emissions if len(e)]) >= 3  # state crossed batches
    final = (
        pd.concat(emissions, ignore_index=True)
        .groupby("event_type", as_index=False)
        .last()  # emissions per key are cumulative; last = full history
        .sort_values("event_type")
        .reset_index(drop=True)
    )

    registry.load_all()
    truth = (
        registry.QUERIES["q_moment_stats"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    got = final[["event_type", "n_events", "mean_x100", "skew_ppm", "kurt_ppm"]]
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "mean_x100": "int64",
                    "skew_ppm": "int64", "kurt_ppm": "int64"}),
        truth.astype({"n_events": "int64", "mean_x100": "int64",
                      "skew_ppm": "int64", "kurt_ppm": "int64"}),
    )


def test_dedup_ingest_snapshot_lake_publishes_atomic_batches(
    spark, tmp_path_factory
):
    """The admission loop with snapshot_lake=True: admitted batches
    land as snapshot commits (one version per admitting batch), the
    assembled table is near-dup-free, and the change feed composes
    with incremental view maintenance."""
    import os
    import time as _time

    from stock_prediction_data_engineering_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from stock_prediction_data_engineering_spark.sources.snapshots import (
        list_versions,
        snapshot_read,
    )
    from stock_prediction_data_engineering_spark.streaming.ingest import (
        start_dedup_ingest,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 80")
    )
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    s1, s2 = pdf.iloc[:40], pdf.iloc[40:]

    root = tmp_path_factory.mktemp("snap_ingest")
    src = str(root / "src")
    os.makedirs(src)
    now = _time.time()
    for i, part in enumerate((s1, s2)):
        p = f"{src}/slice-{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, times=(now + i, now + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index_path = str(root / "index")
    lake_path = str(root / "lake")
    q = start_dedup_ingest(
        stream, index_path, lake_path, snapshot_lake=True
    )
    q.awaitTermination()

    versions = list_versions(lake_path)
    assert len(versions) == 2  # one atomic commit per admitting batch
    lake = snapshot_read(spark, lake_path)
    assert minhash_lsh_pairs(lake, jaccard_threshold=0.7).count() == 0
    assert lake.count() > 0
    # earlier version = strictly the first batch's admissions
    assert (
        snapshot_read(spark, lake_path, version=versions[0]).count()
        < lake.count()
    )


def test_streaming_quantiles_match_batch_sketch(spark, tmp_path_factory):
    """Running quantile brackets across micro-batches: the LAST
    emission per event_type must equal the sqrt-histogram sketch
    built over the full table in one pass — histogram addition is
    order-free integer arithmetic, so chunked evaluation IS batch
    evaluation."""
    import math
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stock_prediction_data_engineering_spark.streaming.quantiles import (
        PCTS,
        quantile_brackets,
        streaming_quantiles,
    )

    src = str(tmp_path_factory.mktemp("quant_src"))
    batch = _batch_events(spark).select("event_type", "ts", "value")
    pdf = batch.toPandas().sort_values("ts").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(src, f"part-{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]]), path
        )
        os.utime(path, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emissions = []

    def capture(df, epoch_id):
        emissions.append(df.toPandas())

    q = (
        streaming_quantiles(stream)
        .writeStream.outputMode("append")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len([e for e in emissions if len(e)]) >= 3
    final = (
        pd.concat(emissions, ignore_index=True)
        .groupby("event_type", as_index=False)
        .last()
        .set_index("event_type")
    )
    # brute-force twin: one-pass histogram over the whole table
    for et, grp in pdf.groupby("event_type"):
        h = {}
        for v in grp["value"]:
            b = math.floor(math.sqrt(round(v * 100)))
            h[b] = h.get(b, 0) + 1
        want_n, want = quantile_brackets(h)
        row = final.loc[et]
        assert row["n"] == want_n
        got = [row[f"p{p}_{s}"] for p in PCTS for s in ("lo", "hi")]
        assert got == want, (et, got, want)
        # and the bracket really contains the exact percentile value
        vals = sorted(round(v * 100) for v in grp["value"])
        for i, p in enumerate(PCTS):
            idx = -(-p * want_n // 100)
            ev = vals[idx - 1]
            assert got[2 * i] <= ev <= got[2 * i + 1], (et, p, ev)


def test_dedup_ingest_substring_screen(spark, tmp_path_factory):
    """The optional winnowing screen rejects a verbatim-overlap doc
    the MinHash probe admits: batch 2's doc shares a 51-char quote
    with an admitted doc but has low set-similarity (different
    filler), so only the substring axis can catch it."""
    import os
    import time as _time

    import pandas as pd

    from stock_prediction_data_engineering_spark.streaming.ingest import (
        start_dedup_ingest,
    )

    fa = "alpha bravo charlie delta echo foxtrot golf hotel india "
    fb = "juliet kilo lima mike november oscar papa quebec romeo "
    fc = "sierra tango uniform victor whiskey xray yankee zulu one "
    quote = "the quick brown fox jumps over the lazy dog tonight"
    s1 = pd.DataFrame({"doc_id": [1], "text": [fa * 2 + quote + fa]})
    s2 = pd.DataFrame(
        {
            "doc_id": [2, 3],
            "text": [fb * 2 + quote + fb, fc * 4],  # 2: quote thief
        }
    )
    root = tmp_path_factory.mktemp("wn_ingest")
    src = str(root / "src")
    os.makedirs(src)
    now = _time.time()
    for i, part in enumerate((s1, s2)):
        p = f"{src}/slice-{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, times=(now + i, now + i))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dedup_ingest(
        stream,
        str(root / "mh_idx"),
        str(root / "lake"),
        substring_index_path=str(root / "wn_idx"),
    )
    q.awaitTermination()
    admitted = {
        r.doc_id for r in spark.read.parquet(str(root / "lake")).collect()
    }
    assert admitted == {1, 3}  # 2 rejected on the verbatim axis
    # the substring index admitted exactly the lake's distinct texts
    from stock_prediction_data_engineering_spark.operators.winnow import (
        winnow_index_probe,
    )

    reprobe = winnow_index_probe(
        spark.createDataFrame(
            [(99, fb + quote + fb)], "doc_id: bigint, text: string"
        ),
        str(root / "wn_idx"),
    ).collect()
    assert {r.corpus_id for r in reprobe} == {1}
