"""Composite queries derived from the reference's real pipeline
(SURVEY.md §2.9).

The reference's one recoverable end-to-end query produces
company_tick_symbols_processed.csv from company_symbols.csv: probe
each symbol's history length, inner-join onto the dimension table,
keep full-history rows with a non-null sector, project/rename, sort
(reference: data_collection/company_data/*.csv; derivation SURVEY
§2.9). Rebased onto testdata: customers with a complete order
history pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query

# A customer with >= 12 orders plays the role of a symbol with the
# full 6,225-day history (reference README.md:8; SURVEY §2.9).
FULL_HISTORY_CNT = 12


@query(
    "q_symbol_preprocess",
    oracle="""
    WITH probe AS (
        SELECT o_custkey, COUNT(*) AS history_cnt, (COUNT(*) > 0) AS has_data
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey AS symbol_key,
           c.c_name    AS company_name,
           c.c_mktsegment AS sector,
           p.has_data  AS data_existing,
           p.history_cnt AS history_existing,
           c.c_acctbal AS acctbal
    FROM customer c
    JOIN probe p ON c.c_custkey = p.o_custkey
    WHERE p.history_cnt >= 12 AND c.c_mktsegment IS NOT NULL
    ORDER BY c.c_custkey
    """,
)
def q_symbol_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: probe-count ⨝ dim → filter → project/rename → sort.

    Composes A2 (per-key count), J1 (inner equi-join), P5/A8
    (having-filter), P3 (rename projection), O1 (sort). The probe
    aggregate is a map-side-partial hash agg; the join side is the
    aggregated (small) relation so Catalyst broadcasts it under AQE.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")

    probe = orders.groupBy("o_custkey").agg(
        F.count("*").alias("history_cnt"),
        (F.count("*") > 0).alias("has_data"),
    )
    return (
        customer.join(probe, customer.c_custkey == probe.o_custkey, "inner")
        .filter((F.col("history_cnt") >= FULL_HISTORY_CNT) & F.col("c_mktsegment").isNotNull())
        .select(
            F.col("c_custkey").alias("symbol_key"),
            F.col("c_name").alias("company_name"),
            F.col("c_mktsegment").alias("sector"),
            F.col("has_data").alias("data_existing"),
            F.col("history_cnt").alias("history_existing"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("symbol_key")
    )


@query(
    "q_batch_assign",
    oracle="""
    SELECT c_custkey,
           CAST(floor((row_number() OVER (ORDER BY c_custkey) - 1) / 100) + 1 AS INTEGER)
               AS batch_id
    FROM customer
    """,
)
def q_batch_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproduce the reference's batch ids (i // batch_size + 1 over the
    symbol list, batch_size=100; reference dags/...aws_s3.py:105-109).

    In Spark the *work* partitioning the batches provided is subsumed
    by tasks; this keeps the ids reproducible as data. The global
    row_number comes from the distributed two-phase rank
    (operators/ranking.py — range partition + per-slice offsets), so
    the same query holds at fact scale: no single-partition window.
    """
    from ..operators.ranking import _with_global_rank

    cust = table(spark, sf_dir, "customer")
    ranked, _total = _with_global_rank(cust, [F.col("c_custkey")], "__rank")
    return ranked.select(
        "c_custkey",
        (F.floor((F.col("__rank") - 1) / 100) + 1).cast("int").alias("batch_id"),
    )


# ---------------------------------------------------------------------------
# Analytical composites (TPC-H-shaped): the downstream queries a user
# of the reference's lake would run for "further analysis"
# (reference README.md:46). Each composes joins, filters, exact
# aggregation, and windows/top-k in one plan.


@query(
    "q_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, order_date, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: segment dim filter → fact join → exact revenue
    aggregate → top-10. The customer/orders sides reduce before the
    lineitem join; revenue sums are DECIMAL-exact so the top-k order is
    engine-independent (full tiebreak on l_orderkey)."""
    from ..functions.exact import DEC

    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_nation_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(CASE WHEN n_name = 'NATION_7'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of supply revenue per order
    year — conditional exact aggregation over a star join (supplier
    and nation broadcast; the only big-big join is
    lineitem ⨝ orders). One double division per group keeps the ratio
    deterministic."""
    from ..functions.exact import DEC

    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    nation_rev = F.when(F.col("n_name") == "NATION_7", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_supplier_ship_delay_rank",
    # dual dialect (round-8): date_diff('day',..) via the interval-day
    # extract (functions/dual_sql.py)
    oracle=f"""
    WITH delays AS (
        SELECT s_nationkey, s_suppkey,
               CAST(SUM(CAST({D.days_between('o_orderdate', 'CAST(l_shipdate AS DATE)')}
                             AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_delay_days
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, s_suppkey
    )
    SELECT s_nationkey, s_suppkey, avg_delay_days,
           CAST(row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY avg_delay_days DESC, s_suppkey)
                AS BIGINT) AS delay_rank
    FROM delays
    """,
)
def q_supplier_ship_delay_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg-then-window composite: per-supplier average order→ship delay
    (exact integer-day sums), ranked within each nation. The window
    runs over the already-aggregated supplier grain — partitioned by
    nation, never a global sort."""
    from ..functions.exact import DEC

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sup = table(spark, sf_dir, "supplier")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate")).cast(
        DEC
    )
    delays = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg((F.sum(delay).cast("double") / F.count("*")).alias("avg_delay_days"))
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("avg_delay_days").desc(), "s_suppkey"
    )
    return delays.select(
        "s_nationkey",
        "s_suppkey",
        "avg_delay_days",
        F.row_number().over(w).cast("bigint").alias("delay_rank"),
    )
