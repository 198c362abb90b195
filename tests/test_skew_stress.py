"""Pathological-skew stress tests (operators/skew.py + AQE posture).

The fixture is the worst case the salting machinery exists for: ONE
key owns 50% of the fact rows. Measured signal is the post-shuffle
partition-size spread (deterministic, unlike task wall-times): in a
plain shuffled join the hot key's entire row set lands in one
partition — the straggler — while the salted join bounds every
partition near the mean. The third test pins Spark's own AQE
skew-split: with thresholds scaled to the fixture, the final adaptive
plan must carry a skew-split shuffle read on the hot partition.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

N_FACT = 200_000
N_KEYS = 1_000
SALTS = 16


@contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


@pytest.fixture(scope="module")
def skewed(spark):
    """Fact: 50% of rows on key 0, the rest uniform over N_KEYS keys.
    Dim: one row per key with a payload (NOT broadcast in the tests —
    the regime salting is for)."""
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload"), F.col("id")).alias("payload"),
    )
    return fact.localCheckpoint(), dim.localCheckpoint()


def _partition_spread(df):
    """(max, mean) of non-empty output-partition row counts."""
    sizes = [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    return max(sizes), sum(sizes) / len(sizes)


def test_salted_join_bounds_hot_partition_vs_plain(spark, skewed):
    """Plain shuffle join: the hot key's partition holds ~50% of all
    rows. Salted join: the hot key spreads over SALTS partitions, so
    the max partition shrinks by ~an order of magnitude. (AQE and
    broadcast disabled so the raw hash-partitioned layout is
    measured.)"""
    from stock_prediction_data_engineering_spark.operators.skew import (
        salted_join,
    )

    fact, dim = skewed
    with confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        plain = fact.join(dim, ["k"], "inner")
        salted = salted_join(fact, dim, ["k"], num_salts=SALTS)
        assert plain.count() == salted.count() == N_FACT

        p_max, p_mean = _partition_spread(plain)
        s_max, s_mean = _partition_spread(salted)

    # plain: one partition owns the hot key's full 50%
    assert p_max >= 0.45 * N_FACT, (p_max, p_mean)
    # salted: hot rows spread over SALTS partitions — max is within a
    # small factor of the hot-share/SALTS slice, far below plain
    assert s_max <= p_max / (SALTS / 4), (s_max, p_max)
    # and the spread is actually balanced, not merely shifted
    assert s_max / s_mean <= 8, (s_max, s_mean)


def test_skew_split_join_salts_only_hot_keys(spark, skewed):
    """skew_split_join must achieve the same hot-partition bound while
    replicating the dim rows of ONLY the detected hot keys (the full
    small side is joined plain on the cold branch)."""
    from stock_prediction_data_engineering_spark.operators.skew import (
        skew_split_join,
    )

    fact, dim = skewed
    with confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        split = skew_split_join(
            fact, dim, ["k"], num_salts=SALTS, top_n=1
        )
        assert split.count() == N_FACT
        s_max, s_mean = _partition_spread(split)
    assert s_max <= 0.5 * N_FACT / (SALTS / 4), (s_max, s_mean)


def test_aqe_skew_join_split_fires_on_hot_partition(spark, skewed):
    """With skew thresholds scaled to the fixture, AQE's runtime
    re-plan must mark the sort-merge join skew-handled and split the
    hot partition into multiple reader slices (the first-line 100 TB
    defense the session enables by default)."""
    fact, dim = skewed
    with confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        },
    ):
        joined = fact.join(dim, ["k"], "inner")
        # collect() (not count(), which builds a separate plan) so THIS
        # DataFrame's adaptive plan reaches isFinalPlan=true
        assert len(joined.collect()) == N_FACT
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead split the hot partition
