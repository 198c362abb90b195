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


# ---------------------------------------------------------------------------
# Round-4 completion: the 10 remaining TPC-H shapes (Q4, Q6, Q7, Q9,
# Q10, Q12, Q14, Q16, Q17, Q19), closing out the full 22-query suite.
# Schema adaptations, stated once: no commit/receipt dates, so "late"
# means shipped more than N days after the order date (Q4/Q12); no
# partsupp, so the part-supplier relation is DISTINCT (l_partkey,
# l_suppkey) and supply cost derives from p_retailprice (Q9/Q16); no
# l_shipmode, so Q12 classes by l_linestatus; no p_container, so Q19's
# disjunctions combine brand, size range, and quantity range.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_priority_late_orders",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: orders placed in a
    quarter with at least one line shipped more than 90 days after the
    order date (the late-delivery EXISTS, lateness adapted to shipdate
    vs orderdate). The correlated EXISTS is a left-semi join whose
    extra date predicate rides the join condition, so the probe side
    never materializes non-qualifying lines; the final count is a
    5-group aggregate."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_revenue_delta",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — forecasting revenue change: the would-be
    revenue gain from eliminating small discounts on low-quantity
    lines in one year. Pure scan-filter-aggregate; all three
    predicates push to the parquet scan and the sum is a single
    map-side partial per partition — the cheapest possible shape, and
    the canonical pushdown check."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC))
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_tpch_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two nations, by
    supplier nation, customer nation, and ship year. The nation-pair
    disjunction is applied AFTER both dimension joins resolve nation
    names (as written in the spec), but both nation joins broadcast
    and the supplier side pre-filters to the two nations' suppliers,
    so the only corpus-scale shuffles are lineitem⨝orders and
    (orders)⨝customer on their natural keys."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("__sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("__sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("__cn_key"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("__cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))
                    - CAST(p_retailprice * l_quantity
                           AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit by supplier nation and
    order year, for parts whose name matches a pattern (supply cost
    adapted to p_retailprice * quantity; the profit difference is
    exact decimal minus exact decimal). The part filter broadcasts and
    prunes lineitem FIRST — at 100 TB the name predicate keeps ~1/5 of
    parts, so pruning before the orders join shrinks the one big
    shuffle by the same factor."""
    li = table(spark, sf_dir, "lineitem")
    parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nat = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
                - (F.col("p_retailprice") * F.col("l_quantity")).cast(DEC)
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q_tpch_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c_acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers who
    lost the most revenue to returns in one quarter. The returnflag
    and date predicates push to both scans before the one real shuffle
    (lineitem⨝orders on orderkey); customer and nation broadcast onto
    the already-aggregated per-customer rollup. Revenue ranks on the
    double image of an exact decimal sum with a unique-key tiebreak,
    so the top 20 is the same set in any engine."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust_nat = table(spark, sf_dir, "customer").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        per_cust.join(
            F.broadcast(
                cust_nat.select("c_custkey", "c_name", "n_name", "c_acctbal")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_shipmode_priority",
    oracle="""
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def q_tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — shipping-class / order-priority matrix over
    slow shipments (lines shipped >30 days after ordering; class
    adapted to l_linestatus). The priority CASE pair is the spec's
    conditional-count idiom; the year predicate pushes to the lineitem
    scan and the lateness theta-predicate rides the equi-join, so no
    post-join filter materializes the fast lines."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q_tpch_promo_effect",
    oracle="""
    WITH r AS (
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  AS DOUBLE) AS promo_revenue,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'
    )
    SELECT promo_revenue, total_revenue,
           100.0 * promo_revenue / total_revenue AS promo_pct
    FROM r
    """,
)
def q_tpch_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the share of one month's
    revenue that came from promotional parts. Both sums are exact
    decimals; the percentage is ONE double multiply-divide applied to
    their double images, the same IEEE operations in either engine, so
    even the ratio hash-matches. The month predicate pushes down and
    the part dimension broadcasts — a single map-side-combined
    aggregate at any scale."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    parts = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    r = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return r.select(
        "promo_revenue",
        "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@query(
    "q_tpch_supplier_parts",
    oracle="""
    WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM rel
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — parts/supplier relationship: how many
    suppliers can furnish parts of given brands/types/sizes, excluding
    flagged suppliers (the NOT IN subquery; complaint flag adapted to
    negative account balance). The relation is DISTINCT (partkey,
    suppkey) from lineitem (no partsupp) — at 100 TB that distinct is
    the one real shuffle and it keys on the pair, skew-free; the part
    filter broadcasts BEFORE the distinct so excluded parts never
    enter it, and the supplier exclusion is a broadcast anti-join."""
    parts = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    rel = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        rel.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q_tpch_small_qty_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey AS a_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN agg ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < qty_sum
    """,
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — small-quantity-order revenue: lines whose
    quantity is below 20% of their part's average quantity (the
    correlated AVG subquery, decorrelated to a per-part aggregate
    joined back). Quantities are integral, so the 20%-of-average
    threshold is compared in EXACT integers (5*qty*cnt < sum — no
    float average can flip a boundary row between engines). One
    shuffle on l_partkey serves both the aggregate and the join-back;
    the brand filter broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.count("*").alias("cnt"),
    )
    brand = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(agg, F.col("a_partkey") == F.col("l_partkey"))
        .filter(
            5 * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("qty_sum")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — discounted revenue under three disjunctive
    (brand, size-range, quantity-range) branches (containers adapted
    to size ranges). The classic Q19 rewrite applies: the join is a
    plain partkey equi-join (broadcast — part is a dimension) and the
    disjunction becomes a post-join filter, instead of the naive
    OR-of-join-conditions that would force a nested-loop join. The
    part side pre-filters to the union of the three brand/size
    envelopes, so the broadcast carries only candidate parts."""
    li = table(spark, sf_dir, "lineitem")
    parts = (
        table(spark, sf_dir, "part")
        .filter(
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 5)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("p_size").between(1, 10)
            )
            | (
                (F.col("p_brand") == "Brand#3")
                & F.col("p_size").between(1, 15)
            )
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
