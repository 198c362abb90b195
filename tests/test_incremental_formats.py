"""Incremental aggregate maintenance (operators/incremental.py) and
interchange-format round-trips (sources/formats.py)."""

from __future__ import annotations

from conftest import SF_SMOKE

from stock_prediction_data_engineering_spark.catalog import table
from stock_prediction_data_engineering_spark.operators.incremental import (
    finalize,
    merge_states,
    partial_agg,
)
from stock_prediction_data_engineering_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

KEYS = ["user_id"]


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_incremental_merge_equals_full_recompute(spark):
    ev = table(spark, SF_SMOKE, "events")
    # split the stream into two "daily batches"
    b1 = ev.filter(ev.event_id % 2 == 0)
    b2 = ev.filter(ev.event_id % 2 == 1)
    merged = merge_states(
        partial_agg(b1, KEYS, "value"), partial_agg(b2, KEYS, "value"), KEYS
    )
    full = partial_agg(ev, KEYS, "value")
    cols = KEYS + ["n", "s", "mn", "mx"]
    assert _sorted_rows(merged, cols) == _sorted_rows(full, cols)


def test_incremental_merge_is_order_insensitive(spark):
    ev = table(spark, SF_SMOKE, "events")
    b1 = ev.filter(ev.event_id % 3 == 0)
    b2 = ev.filter(ev.event_id % 3 == 1)
    b3 = ev.filter(ev.event_id % 3 == 2)
    s1, s2, s3 = (partial_agg(b, KEYS, "value") for b in (b1, b2, b3))
    left = merge_states(merge_states(s1, s2, KEYS), s3, KEYS)
    right = merge_states(s1, merge_states(s3, s2, KEYS), KEYS)
    cols = KEYS + ["n", "s", "mn", "mx"]
    assert _sorted_rows(left, cols) == _sorted_rows(right, cols)


def test_finalize_mean_matches_direct(spark):
    from pyspark.sql import functions as F

    ev = table(spark, SF_SMOKE, "events")
    view = finalize(partial_agg(ev, KEYS, "value"), KEYS)
    direct = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("value")).alias(
            "mean"
        )
    )
    got = {r["user_id"]: r["mean"] for r in view.collect()}
    want = {r["user_id"]: r["mean"] for r in direct.collect()}
    assert got == want


def _events_subset(spark):
    ev = table(spark, SF_SMOKE, "events")
    return ev.filter(ev.event_id < 200).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def test_jsonl_round_trip(spark, tmp_path):
    df = _events_subset(spark)
    p = str(tmp_path / "ev_jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, df.schema)
    assert back.schema == df.schema
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    assert _sorted_rows(back, cols) == _sorted_rows(df, cols)


def test_csv_round_trip(spark, tmp_path):
    df = _events_subset(spark)
    p = str(tmp_path / "ev_csv")
    write_csv(df, p)
    back = read_csv(spark, p, df.schema)
    assert back.schema == df.schema
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    assert _sorted_rows(back, cols) == _sorted_rows(df, cols)


def test_orc_round_trip(spark, tmp_path):
    df = _events_subset(spark)
    p = str(tmp_path / "ev_orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    assert _sorted_rows(back, cols) == _sorted_rows(df, cols)


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    df = _events_subset(spark)
    p = str(tmp_path / "ev_orc_pd")
    write_orc(df, p)
    back = read_orc(spark, p).filter("user_id = 3").select("event_id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan
