"""TPC-H completeness family: the remaining recognizable TPC-H query
shapes, adapted to the testdata's star schema (no partsupp table and
no receipt/commit dates, so Q2/Q11/Q20/Q21 derive their supplier-part
economics from lineitem — the shapes, join graphs, and subquery
structures are preserved; the missing columns are substituted, never
faked).

Q1/Q3/Q5/Q8 shapes already exist (q_multi_agg, q_join_multiway, the
composite family); this module adds Q2, Q11, Q13, Q15, Q18, Q20, Q21,
Q22 so "TPC-H-ish" is a claim an outside reader can check query by
query. All oracle-backed and hash-exact: money flows through
DECIMAL(18,4) partial sums (or integer cents where a THRESHOLD
comparison must be exact — a share-of-total boundary row must fall on
the same side in both engines, so Q11 compares val*count > 2*total in
pure integers).

Scale shapes: every query is aggregate-then-join — the correlated
subqueries decorrelate to keyed min/max/sum aggregates joined back on
the group key (what Catalyst does to the SQL forms too), so nothing
re-executes per row; dimension joins broadcast; the only big shuffles
key on l_partkey / l_orderkey / l_suppkey, the natural fact keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

DEC = "decimal(18,4)"
CENTS = "decimal(18,2)"


def _cents(col: str) -> F.Column:
    """Exact integer cents of a <=2-decimal money column."""
    return (F.col(col).cast(CENTS) * 100).cast("bigint")


@query(
    "q_tpch_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
           CAST(ps.supply_cost AS DOUBLE) AS supply_cost
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND ps.supply_cost = (SELECT MIN(ps2.supply_cost) FROM ps ps2
                            WHERE ps2.l_partkey = ps.l_partkey)
    ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier per part via a
    correlated MIN subquery (decorrelated here to a per-part min
    aggregate joined back on (partkey, exact decimal cost)), then the
    supplier->nation->region dimension chain with the region filter.
    Supply cost derives from lineitem (no partsupp in this schema).
    The LIMIT carries a total order (acctbal desc, partkey, suppkey is
    unique), so the same 100 rows surface in any engine."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("supply_cost"))
    min_cost = ps.groupBy("l_partkey").agg(
        F.min("supply_cost").alias("__min_cost")
    )
    best = ps.join(min_cost, "l_partkey").filter(
        F.col("supply_cost") == F.col("__min_cost")
    )
    nat = table(spark, sf_dir, "nation").join(
        F.broadcast(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        best.join(
            F.broadcast(table(spark, sf_dir, "part").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


@query(
    "q_tpch_part_value_share",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS val_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, val_cents
    FROM pv
    WHERE val_cents * (SELECT COUNT(*) FROM pv)
          > 2 * (SELECT SUM(val_cents) FROM pv)
    ORDER BY val_cents DESC, partkey
    """,
)
def q_tpch_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — per-part value for one nation's suppliers,
    HAVING share > 2x the mean part share (Q11's fixed-fraction
    threshold goes degenerate as part count scales — a mean-relative
    cut is scale-free, so the query stays selective at any sf). The
    boundary is compared in PURE INTEGERS (val*count vs 2*total cents)
    so no boundary row can fall on different sides across engines. The
    scalar total broadcasts; only the per-part aggregate shuffles."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").join(
        F.broadcast(
            table(spark, sf_dir, "nation").filter(
                F.col("n_name") == "NATION_7"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    pv = (
        li.join(F.broadcast(sup.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("val_cents"))
    )
    total = pv.agg(
        F.sum("val_cents").alias("__total"), F.count("*").alias("__n_parts")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val_cents") * F.col("__n_parts") > 2 * F.col("__total"))
        .select(F.col("l_partkey").alias("partkey"), "val_cents")
        .orderBy(F.col("val_cents").desc(), "partkey")
    )


@query(
    "q_tpch_order_count_histogram",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution through a
    filtered LEFT OUTER join (the filter lives in the join condition,
    not a WHERE — customers with only filtered-out orders count 0, not
    vanish) and a double aggregation. Pure integers."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — quarterly revenue view, then the supplier(s)
    achieving the global max (scalar subquery -> 1-row broadcast; the
    max comparison is on exact decimals, so ties surface identically
    in both engines)."""
    li = table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(table(spark, sf_dir, "supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume orders: the HAVING subquery
    becomes a keyed aggregate left-semi-joined onto orders (one
    shuffle on l_orderkey, reused by the outer re-aggregation), then
    the customer dimension broadcasts. Quantity threshold compares on
    exact decimals."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__qty"))
        .filter(F.col("__qty") > 200)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select("c_custkey", "c_name")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_excess_shippers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty,
             SUM(CASE WHEN year(l_shipdate) = 1997
                      THEN CAST(l_quantity AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS qty_1997
      FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM sp
                  WHERE sp.l_suppkey = s.s_suppkey
                    AND sp.qty_1997 * 2 > sp.total_qty
                    AND sp.qty_1997 > 0)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers who concentrated a part's shipments
    in one year (the availqty predicate reshaped to shipped
    quantities): nested EXISTS becomes a per-(supplier, part) aggregate
    filtered on an exact decimal inequality, then a left-semi join
    into the supplier dimension."""
    li = table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast(DEC)
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"),
        F.sum(
            F.when(
                F.year("l_shipdate") == 1997, F.col("l_quantity").cast(DEC)
            ).otherwise(zero)
        ).alias("qty_1997"),
    )
    hot = sp.filter(
        (F.col("qty_1997") * 2 > F.col("total_qty")) & (F.col("qty_1997") > 0)
    ).select("l_suppkey")
    return (
        table(spark, sf_dir, "supplier")
        .join(hot, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_sole_late_shipper",
    oracle="""
    WITH per_os AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    ord AS (
      SELECT l_orderkey, MAX(supp_last) AS order_last, COUNT(*) AS n_supp
      FROM per_os GROUP BY l_orderkey
    ),
    at_max AS (
      SELECT p.l_orderkey, COUNT(*) AS n_at_max
      FROM per_os p
      JOIN ord o ON p.l_orderkey = o.l_orderkey
                AND p.supp_last = o.order_last
      GROUP BY p.l_orderkey
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM per_os p
    JOIN ord o ON p.l_orderkey = o.l_orderkey
              AND p.supp_last = o.order_last AND o.n_supp >= 2
    JOIN at_max a ON a.l_orderkey = p.l_orderkey AND a.n_at_max = 1
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the supplier who SOLELY held up each
    multi-supplier order (last ship date, achieved by exactly one
    supplier; receipt/commit dates reshaped to ship dates). The
    EXISTS / NOT-EXISTS pair becomes: per-(order, supplier) max date,
    per-order max + achiever count, keep orders with >=2 suppliers
    whose max is unique, count per supplier. All shuffles key on
    l_orderkey; supplier broadcast-joins at the end."""
    li = table(spark, sf_dir, "lineitem")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        F.max("supp_last").over(w).alias("order_last"),
        F.count("*").over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.count(F.when(F.col("supp_last") == F.col("order_last"), 1)).over(w),
    )
    sole = flagged.filter(
        (F.col("n_supp") >= 2)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_at_max") == 1)
    )
    return (
        sole.join(
            F.broadcast(
                table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(100)
    )


@query(
    "q_tpch_quiet_rich_customers",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                                   AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def q_tpch_quiet_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — above-average-balance customers with no
    urgent orders (phone-prefix country codes reshaped to market
    segments; no-orders-at-all is empty in this data, so the NOT
    EXISTS filters on urgent orders). Scalar avg broadcasts (exact
    decimal sum / count, one double division identical in both
    engines); the NOT EXISTS is a left-anti join."""
    cust = table(spark, sf_dir, "customer")
    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("__avg_bal")
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("segment")
    )
