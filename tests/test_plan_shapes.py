"""Physical-plan regression tests: the scale properties we rely on at
100 TB — pushdown, pruning, broadcast choice, bucketed exchange
elision — asserted on the actual executed plans so a refactor that
silently de-optimizes a query fails CI, not a cluster run.
"""

from __future__ import annotations

from conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    """A filter+projection must reach the parquet scan: pushed filter
    present, ReadSchema narrowed to the selected columns only."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_filter_predicate"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # no scan in the plan reads every customer column
    assert "c_comment" not in plan.split("ReadSchema")[-1]


def test_multiway_join_broadcasts_dims(spark):
    """Star join: every dimension side broadcast, exactly one shuffle
    (the final aggregation exchange)."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_join_multiway"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 4
    assert plan.count("Exchange hashpartitioning") == 1


def test_window_partitions_by_key(spark):
    """Per-key windows must not collapse to a single global partition
    (a single-partition window is the classic 100 TB cliff)."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_window_lag_return"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SinglePartition" not in plan


def _has_unpartitioned_window(plan: str) -> bool:
    """True if any Window node in the rendered plan has an EMPTY
    partition spec. Node format is ``Window [exprs], [part], [order]``
    with empty specs OMITTED from the rendering, so:

    - 2 separators: partition + order both present — fine;
    - 1 separator: the trailing group is either an order spec (sort
      direction tokens present ⇒ partition omitted — OFFENDER) or a
      partition spec (plain columns, no sort tokens — fine);
    - 0 separators: neither spec — a frame-only global window,
      OFFENDER.

    Verified against all three shapes in the detector self-test."""
    for line in plan.splitlines():
        body = line.lstrip(" :+-*")
        if not body.startswith("Window ["):
            continue
        n_groups = body.count("], [")
        if n_groups >= 2:
            continue
        if n_groups == 0:
            return True
        tail = body.rsplit("], [", 1)[1]
        if " ASC" in tail or " DESC" in tail:
            return True
    return False


def test_no_query_plans_a_single_partition_window(spark):
    """Global audit over EVERY registered query: no executed plan may
    contain a Window operator with an empty partition spec — the
    un-partitioned-window cliff class, with no exemptions. (The check
    is per Window node, not plan-wide Window+SinglePartition
    co-occurrence: a legitimate 1-row global aggregate reduce — e.g.
    q_domain_resample's min-over-sources — may share a plan with a
    correctly keyed window.)"""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    offenders = []
    unanalyzable = {}
    for name, fn in registry.QUERIES.items():
        # isolate per query: one query whose *analysis* throws must not
        # abort the audit of the rest (it masked the real offender set
        # in round 2) — collect it and fail with the full list instead
        try:
            plan = _plan(fn(spark, SF_SMOKE))
        except Exception as exc:  # noqa: BLE001
            unanalyzable[name] = (str(exc).splitlines() or [""])[0][:160]
            continue
        if _has_unpartitioned_window(plan):
            offenders.append(name)
    assert offenders == [], offenders
    assert unanalyzable == {}, unanalyzable


def test_unpartitioned_window_detector_fires_on_global_window(spark):
    """The audit's detector must actually catch the cliff shape it
    guards against (otherwise a rendering change could silently turn
    the audit into a no-op)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn("k", F.col("id") % 2)
    glob = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    part = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    # partition-only window (no order spec): keyed, NOT an offender
    part_only = df.withColumn(
        "n", F.count("*").over(Window.partitionBy("k"))
    )
    # frame-only global window: neither spec, offender
    glob_frame = df.withColumn("n", F.count("*").over(Window.partitionBy()))
    assert _has_unpartitioned_window(_plan(glob))
    assert _has_unpartitioned_window(_plan(glob_frame))
    assert not _has_unpartitioned_window(_plan(part))
    assert not _has_unpartitioned_window(_plan(part_only))


def test_ntile_has_no_single_partition_window(spark):
    """q_ntile is a *global* rank but must still not plan a
    single-partition window: the distributed NTILE range-partitions and
    ranks per-slice (operators/ranking.py)."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark import registry
    from stock_prediction_data_engineering_spark.operators.ranking import global_ntile

    registry.load_all()
    df = registry.QUERIES["q_ntile"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SinglePartition" not in plan
    # the range-partitioned sort is pinned by a localCheckpoint (cross-job
    # boundary determinism — see operators/ranking.py), so the downstream
    # plan starts from the checkpointed slices and the per-slice window
    # must be keyed on the slice id, never a global partition
    assert "__rank_pid" in plan

    # exact-semantics check vs the SQL ntile on the same input
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    got = {
        (r.c_custkey, r.wealth_quartile)
        for r in df.collect()
    }
    cust.createOrReplaceTempView("ntile_cust")
    want = {
        (r.c_custkey, r.q)
        for r in spark.sql(
            "SELECT c_custkey, ntile(4) OVER "
            "(ORDER BY c_acctbal DESC, c_custkey) AS q FROM ntile_cust"
        ).collect()
    }
    assert got == want


def test_bucketed_join_elides_shuffle(spark, tmp_path_factory):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with zero Exchange nodes."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.sources.bucketed import (
        cojoin,
        write_bucketed,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders",
        ["custkey"],
        num_buckets=8,
        sort_cols=["custkey"],
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer",
        ["custkey"],
        num_buckets=8,
        sort_cols=["custkey"],
    )
    # force the sort-merge path: broadcast would hide the exchange story
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoin(spark, "b_orders", "b_customer", ["custkey"]).select(
            "custkey", "o_totalprice", "c_acctbal"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it computes the right thing
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_limit_becomes_take_ordered(spark):
    """Ordered limit must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_filter_limit"](spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in _plan(df)


def test_analytical_composites_plan_shape(spark):
    """TPC-H-shaped composites: dims broadcast (no sort-merge at test
    scale), minimal exchanges, and the top-k plans as
    TakeOrderedAndProject rather than a global sort."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    plan = _plan(registry.QUERIES["q_top_revenue_orders"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") <= 1

    plan = _plan(registry.QUERIES["q_nation_market_share"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1

    plan = _plan(registry.QUERIES["q_supplier_ship_delay_rank"](spark, SF_SMOKE))
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics: a 90%-hot-key fact
    joined to a medium dim gives identical aggregates salted and
    plain, for inner and left joins (incl. unmatched left rows)."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.skew import salted_join

    fact = spark.range(0, 20000).select(
        # 90% of rows share key 7; the rest spread over 0..99, with
        # some keys (>=50) absent from the dim to exercise left-join nulls
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )

    for how in ("inner", "left"):
        plain = (
            fact.join(dim, ["k"], how)
            .groupBy("k", "name")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        salted = (
            salted_join(fact, dim, ["k"], num_salts=8, how=how)
            .groupBy("k", "name")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        diff = plain.unionByName(salted).groupBy("k", "name", "n", "s").count().filter(
            "count != 2"
        )
        assert diff.count() == 0, f"salted {how} join diverged from plain"


def test_finance_indicator_plan_shapes(spark):
    """Bollinger's three window accumulators must share one (user_id)
    hash partitioning (a single exchange feeding one Window op);
    market beta must broadcast the tiny per-day market table and keep
    exactly the three keyed aggregation exchanges."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    boll = _plan(registry.QUERIES["q_bollinger_bands"](spark, SF_SMOKE))
    assert boll.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in boll

    beta = _plan(registry.QUERIES["q_market_beta"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in beta or "BroadcastExchange" in beta
    assert "SinglePartition" not in beta

    # five features, one data movement: all frames share the per-key
    # partitioning, so the whole matrix is a single exchange
    feat = _plan(registry.QUERIES["q_feature_matrix"](spark, SF_SMOKE))
    assert feat.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in feat


def test_training_assembly_plan_shapes(spark):
    """The round-3 training-data assembly queries keep their scale
    shapes: packing is ONE per-domain exchange; the skew profile's
    grand total is a broadcast of a single row plus a top-k take, never
    a global sort; the splitter is a pure map + one small aggregate."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()

    pack = _plan(registry.QUERIES["q_sequence_pack"](spark, SF_SMOKE))
    assert pack.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in pack

    heavy = _plan(registry.QUERIES["q_heavy_keys"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in heavy  # the 1-row total
    assert "TakeOrderedAndProject" in heavy    # top-20, no global sort
    assert "Sort " not in heavy.split("TakeOrderedAndProject")[0]

    split = _plan(registry.QUERIES["q_train_split"](spark, SF_SMOKE))
    # one exchange for the (source, split) aggregate; nothing else
    assert split.count("Exchange hashpartitioning") == 1


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """With runtime filtering on (and the size threshold dropped to
    make test-scale data eligible — at 100 TB the 10 GB default fires
    on its own), a selective dim filter must inject a bloom
    might_contain predicate on the fact scan side of a shuffle join:
    non-joining fact rows die at the mappers, not after the exchange."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.session import (
        enable_runtime_filters,
    )

    enable_runtime_filters(spark, demo_scale=True)
    prev_broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_broadcast)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "10GB",
        )


def test_tpch_completion_plan_shapes(spark):
    """The round-close TPC-H shapes keep their scale contracts:
    Q9 broadcasts both dimension sides (part, supplier⨝nation) and
    never builds a cartesian; Q16's exclusion is a broadcast anti
    join; Q6 pushes all predicates to the scan."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    q9 = _plan(registry.QUERIES["q_tpch_product_profit"](spark, SF_SMOKE))
    assert q9.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in q9 and "BroadcastNestedLoop" not in q9
    q16 = _plan(registry.QUERIES["q_tpch_supplier_parts"](spark, SF_SMOKE))
    assert "LeftAnti, BuildRight" in q16
    q6 = _plan(registry.QUERIES["q_tpch_revenue_delta"](spark, SF_SMOKE))
    assert "PushedFilters: [" in q6
    assert "SinglePartition" not in q6.split("HashAggregate")[0]


def test_winnow_and_covariance_plan_shapes(spark):
    """q_substring_dedup: keyed joins only — no cartesian, no
    single-partition stage before the final assembly. q_feature_
    covariance: ONE parquet scan feeds the whole 15-sum aggregate
    (the stack() rewrite must not re-scan per cell)."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    wn = _plan(registry.QUERIES["q_substring_dedup"](spark, SF_SMOKE))
    assert "CartesianProduct" not in wn and "BroadcastNestedLoop" not in wn
    cov = _plan(registry.QUERIES["q_feature_covariance"](spark, SF_SMOKE))
    assert cov.count("Scan parquet") == 1


def test_round9_curation_plan_shapes(spark):
    """Round-9 additions keep their scale contracts. q_dsir_select:
    the exploded token stream is consumed by exactly ONE pre-aggregate
    (one parquet scan of documents in the whole plan), the log-ratio
    table joins as a broadcast, and no stage collapses to a single
    partition before the final top-k. q_char_entropy: one scan, no
    joins at all, no single-partition exchange. q_group_split: the
    split is a pure projection riding the scan — no join, exactly the
    two aggregate exchanges Spark plans for an exact distinct-count."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    dsir = _plan(registry.QUERIES["q_dsir_select"](spark, SF_SMOKE))
    # the token explode lives BEHIND the localCheckpoint barrier: the
    # final plan reads the materialized (class, doc, bucket) counts —
    # zero parquet scans here proves the corpus is never re-exploded,
    # and both consumers (distribution fit + per-doc score) read the
    # same checkpointed RDD
    assert dsir.count("Scan parquet") == 0
    assert dsir.count("Scan ExistingRDD") >= 2
    assert "BroadcastHashJoin" in dsir
    assert "CartesianProduct" not in dsir
    # exactly ONE SinglePartition exchange, and it is the final step
    # of the keyless grand-total aggregate (its input is the 256-row
    # bucket table, never corpus rows) — the doc- and bucket-keyed
    # aggregates all stay hash-partitioned
    assert dsir.count("Exchange SinglePartition") == 1

    ent = _plan(registry.QUERIES["q_char_entropy"](spark, SF_SMOKE))
    assert ent.count("Scan parquet") == 1
    assert "Join" not in ent
    assert "SinglePartition" not in ent

    gs = _plan(registry.QUERIES["q_group_split"](spark, SF_SMOKE))
    assert gs.count("Scan parquet") == 1
    assert "Join" not in gs
    assert "SinglePartition" not in gs


def test_ann_rerank_pushes_shortlist_ids_into_scan(spark):
    """The re-rank stage's exact pass must read the float table
    through a pushed-down id predicate (In filter reaching the parquet
    scan — row-group pruning on vec_id), never a second full-corpus
    pass; the shortlist side joins as a broadcast of bounded rows."""
    from stock_prediction_data_engineering_spark.operators import pq

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    index = pq.pq_build(emb, m=8, nbits=6)
    qv = emb.filter(emb.vec_id == 0).select("embedding")
    df = pq.pq_search(index, qv, k=5, rerank_from=emb, shortlist=20)
    plan = _plan(df)
    scan_tail = plan.split("PushedFilters: [In(vec_id")
    assert len(scan_tail) >= 2, plan
    assert "BroadcastExchange" in plan


def test_segment_dedup_split_not_inlined_into_lambda(spark):
    """The segment transform's word-split must stay BEHIND the
    checkpoint barrier: CollapseProject inlining split(text) into the
    per-segment slice lambda re-splits the document once per segment
    (O(words²/seg_words) per doc — the winnow.py trap, measured
    36.7 s → 21.1 s at sf10 when fixed)."""
    from stock_prediction_data_engineering_spark.operators.dedup import (
        segment_dedup_clean,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _optimized(segment_dedup_clean(docs))
    assert "slice(split(" not in plan
