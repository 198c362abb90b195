"""Aggregations (SURVEY.md §2.4).

Reference lineage: groupby("Year") partition-grain write (reference
dags/stock_data_airflow_local_aws_s3.py:51), the implied per-symbol
history-count probe behind History_Existing/Data_Exising, and the
standard multi-aggregate surface the lake exists to serve.

All are hash aggregates with map-side partial aggregation; float sums
use exact DECIMAL(18,4) accumulation (functions/exact.py) so results
are order-independent at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exact import davg, dsum
from ..registry import query


@query(
    "q_groupby_year_count",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, COUNT(*) AS cnt
    FROM orders
    GROUP BY order_year
    """,
)
def q_groupby_year_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's groupby('Year') grain as a count query (A1/C3)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_history_count",
    oracle="""
    SELECT o_custkey AS key, COUNT(*) AS history_cnt, (COUNT(*) > 0) AS has_data
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_history_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key history length + existence flag — the probe behind the
    reference's History_Existing / Data_Exising columns (A2/A3)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").alias("history_cnt"), (F.count("*") > 0).alias("has_data"))
    )


@query(
    "q_multi_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical multi-aggregate
    scan (A4). Single hash-agg stage, partial+final."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment AS segment, c_nationkey AS nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (A5)."""
    return (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"), F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (A5). The approximate HLL++ twin
    is q_approx_count_distinct (rows-only; sketches differ by engine)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query("q_approx_count_distinct")  # rows-only: sketch values are engine-specific
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (A6) — the 100 TB path where exact
    distinct would shuffle every key."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (A7): detail + subtotal + grand total.

    Two-level plan: Spark evaluates ROLLUP with an Expand node that
    replicates every input row once per grouping set, so a direct
    rollup hashes 3x the fact table. Pre-aggregating to the finest
    grain first (a handful of rows) and rolling that up is exact for
    COUNT/SUM and cuts the expanded input from 3N to ~3x|groups|.
    """
    pre = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt_p"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_p"),
        )
    )
    return pre.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("cnt_p").alias("cnt"),
        F.sum("qty_p").cast("double").alias("sum_qty"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A7, completing rollup/cube): per-flag
    totals, per-status totals, and the grand total in one pass —
    subtotal shapes ROLLUP cannot express (it only nests prefixes).

    Same Expand-node economics as q_rollup: pre-aggregate to the
    finest (flag, status) grain first so the 3x grouping-set
    replication happens on ~|groups| rows instead of the fact table.
    """
    pre = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt_p"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_p"),
        )
    )
    return pre.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.sum("cnt_p").alias("cnt"),
        F.sum("qty_p").cast("double").alias("sum_qty"),
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS urgent_revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (A9) — one pass, no self-join."""
    urgent = F.col("o_orderpriority") == "1-URGENT"
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("n_urgent"),
            F.sum(F.when(urgent, F.col("o_totalprice").cast("decimal(18,4)")).otherwise(zero))
            .cast("double")
            .alias("urgent_revenue"),
        )
    )


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) with an explicit value list (SURVEY §2
    'absent categories' — trivially available, included for surface
    completeness). Explicit values keep the plan a single pass: Spark
    rewrites pivot-with-values to one conditional-agg stage, no extra
    job to discover distinct keys."""
    out = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
    )
    names = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    for val, name in zip(PRIORITIES, names):
        # count() pivots to null for empty cells; the oracle's FILTER
        # count yields 0 — align on 0
        out = out.withColumn(name, F.coalesce(F.col(f"`{val}`"), F.lit(0)).cast("bigint"))
    return out.select("o_orderstatus", *names)


@query(
    "q_value_autocorr",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                               AS DOUBLE) * 100)
                    AS BIGINT) AS xi
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT event_type, xi,
               lag(xi) OVER (PARTITION BY event_type ORDER BY day) AS yi
        FROM daily
    ),
    sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(xi) AS sx, SUM(yi) AS sy,
               SUM((CAST(xi AS DECIMAL(19,0)) * CAST(yi AS DECIMAL(19,0)))) AS sxy,
               SUM((CAST(xi AS DECIMAL(19,0)) * CAST(xi AS DECIMAL(19,0)))) AS sxx,
               SUM((CAST(yi AS DECIMAL(19,0)) * CAST(yi AS DECIMAL(19,0)))) AS syy
        FROM lagged WHERE yi IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
               AS autocorr
    FROM sums
    """,
)
def q_value_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily total value per event type —
    the stationarity probe a return-prediction pipeline runs first.

    Pearson r is assembled from INTEGER component sums: the exact
    decimal day total is scaled to cents (a lossless long, since
    inputs carry <=2 decimals), so n, Σx, Σy, Σxy, Σx², Σy² are
    integer arithmetic and bit-identical across engines; the final
    formula is a fixed sequence of double ops on identical integers.
    A native corr() aggregate accumulates doubles in shuffle order and
    would not hash-match. Two shuffles total (daily agg, per-type
    sums); the lag window is per-type, never global.
    """
    from pyspark.sql import Window

    from ..functions.exact import dsum

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(dsum("value") * 100).cast("long").alias("xi"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "xi", F.lag("xi").over(w).alias("yi")
    ).filter(F.col("yi").isNotNull())

    # daily totals grow linearly with corpus size, so their products
    # overflow int64 around sf10-sf100; decimal(19,0) operands make
    # the products exact decimal(38,0) (oracle: HUGEINT)
    xid = F.col("xi").cast("decimal(19,0)")
    yid = F.col("yi").cast("decimal(19,0)")
    sums = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(xid * yid).alias("sxy"),
        F.sum(xid * xid).alias("sxx"),
        F.sum(yid * yid).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (d("n") * d("sxy") - d("sx") * d("sy")) / F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(corr, 4).alias("autocorr"),
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_type, cnt AS mode_cnt
    FROM r WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key mode (most frequent value, A4/A5 completeness):
    the dominant event_type per user with a deterministic tie-break
    (higher count first, then lexicographic) — the categorical twin of
    max/min, used for "primary activity" labeling.

    Scale shape: keyed (user, type) count first — map-side partials
    collapse the raw stream before any shuffle — then a per-user
    window over the already-tiny counts table. Both stages hash on
    user_id, so the window reuses the aggregate's partitioning: one
    exchange end-to-end, never a global sort."""
    from pyspark.sql import Window

    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").alias("mode_cnt"),
        )
    )


@query("q_hll_merge")
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (A6 completeness beyond the
    scalar approx_count_distinct): per-year HLL sketches of the
    ordering customers, plus a __total__ row whose estimate comes
    from UNIONING the per-year sketch states — never re-scanning the
    facts. This is the 100 TB pattern for distinct-count rollups:
    persist sketch bytes per partition/day, answer any coarser grain
    by sketch union (Datasketches HLL via Spark's hll_sketch_agg /
    hll_union_agg builtins).

    Rows-only by design: sketch estimates are engine-specific.
    tests/test_dedup_similarity.py pins the estimates to within 5%
    of the exact distinct counts at sf0.01."""
    o = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("order_year"), "o_custkey"
    )
    per_year = o.groupBy("order_year").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    yearly = per_year.select(
        F.col("order_year").cast("string").alias("grain"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_customers"),
    )
    total = per_year.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("est_customers")
    ).select(F.lit("__total__").alias("grain"), "est_customers")
    return yearly.unionAll(total)


@query(
    "q_yoy_growth",
    oracle="""
    WITH y AS (
      SELECT year(o_orderdate) AS order_year,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))*100 AS BIGINT)
               AS revenue_c
      FROM orders GROUP BY order_year
    )
    SELECT order_year, revenue_c,
           CAST(FLOOR(CAST(revenue_c - lag(revenue_c)
                           OVER (ORDER BY order_year) AS DOUBLE) * 10000
                      / lag(revenue_c) OVER (ORDER BY order_year))
                AS BIGINT) AS yoy_bp
    FROM y
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth in basis points. Growth can be
    negative, so the ratio goes through FLOOR of an exact double
    quotient (the q_ab_lift signed-division rule: Spark `div`
    truncates, DuckDB `//` floors — they disagree exactly on negative
    growth).

    The 'lag' over the year-level aggregate is an equi-join on
    year-1, not a window: years are a contiguous integer key, so the
    previous row IS the previous key — a keyed broadcast join with no
    global ordering anywhere (the plan audit rejects even a
    constant-partition window, correctly: the optimizer folds the
    constant away into an empty partition spec)."""
    y = (
        table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 100)
            .cast("bigint")
            .alias("revenue_c")
        )
    )
    prev = y.select(
        (F.col("order_year") + 1).alias("order_year"),
        F.col("revenue_c").alias("prev_c"),
    )
    return y.join(F.broadcast(prev), "order_year", "left").select(
        "order_year",
        "revenue_c",
        F.floor(
            (F.col("revenue_c") - F.col("prev_c")).cast("double")
            * 10000
            / F.col("prev_c")
        )
        .cast("bigint")
        .alias("yoy_bp"),
    )


@query(
    "q_ratio_to_report",
    oracle="""
    WITH n AS (
      SELECT r.r_name AS region_name, na.n_name AS nation_name,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4)))*100 AS BIGINT)
               AS bal_c
      FROM customer c
      JOIN nation na ON c.c_nationkey = na.n_nationkey
      JOIN region r ON na.n_regionkey = r.r_regionkey
      GROUP BY region_name, nation_name
    ),
    t AS (
      SELECT region_name, CAST(SUM(bal_c) AS BIGINT) AS region_c
      FROM n GROUP BY region_name
    )
    SELECT n.region_name, nation_name, bal_c,
           CAST(FLOOR(CAST(bal_c AS DOUBLE) * 10000 / region_c) AS BIGINT)
             AS share_bp
    FROM n JOIN t USING (region_name)
    """,
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT (share of parent): each nation's customer
    balance as basis points of its region's total — the percent-of-
    parent OLAP primitive. Computed as agg -> parent re-agg ->
    broadcast join, NOT a partition-total window over the fact table:
    the ratio attaches to the nation-level AGGREGATE (bounded rows),
    so the fact table is scanned once and shuffled once. Balances can
    be negative, so the share goes through FLOOR of an exact double
    quotient (the signed-division portability rule)."""
    c = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    n = (
        c.join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .join(F.broadcast(r), na.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(18,4)")) * 100)
            .cast("bigint")
            .alias("bal_c")
        )
    )
    t = n.groupBy("region_name").agg(
        F.sum("bal_c").cast("bigint").alias("region_c")
    )
    return n.join(F.broadcast(t), "region_name").select(
        "region_name",
        "nation_name",
        "bal_c",
        F.floor(F.col("bal_c").cast("double") * 10000 / F.col("region_c"))
        .cast("bigint")
        .alias("share_bp"),
    )
