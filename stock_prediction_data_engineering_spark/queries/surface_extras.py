"""Additional oracle-checked surface queries (round-1 widening beyond
SURVEY.md §2's declared roster): EXISTS-subquery, arg-min/max
first/last lookup, exact interpolated percentile, and ordered string
aggregation — shapes a reference user migrating real workloads hits
immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS through SQL text — Catalyst rewrites to a left-semi join
    (same plan as q_join_semi's DataFrame form)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


@query(
    "q_first_last_value",
    oracle="""
    SELECT user_id,
           ROUND(min_by(value, ts), 4) AS first_value,
           ROUND(max_by(value, ts), 4) AS last_value
    FROM events
    GROUP BY user_id
    """,
)
def q_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last observation per key by event time — min_by/max_by
    aggregate form (one hash agg), not a window + filter (two passes).
    Deterministic because (user_id, ts) is unique in the data."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("first_value"),
            F.round(F.max_by("value", "ts"), 4).alias("last_value"),
        )
    )


@query(
    "q_percentile",
    oracle="""
    SELECT c_mktsegment,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 4)
             AS median_bal,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY c_acctbal), 4)
             AS p90_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Both engines use
    linear interpolation on the sorted values, so results match to
    rounding; the 100 TB variant is percentile_approx (one-pass
    sketch), kept out of the hash-checked set."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
        )
    )


@query(
    "q_string_agg",
    # dual-dialect (round 10): GROUPED ordered aggregation has no
    # shared syntax (DuckDB wants ORDER BY inside the call, Spark
    # wants WITHIN GROUP), but the WINDOWED form does — both engines
    # accept string_agg(x, sep) OVER (... ORDER BY x ROWS BETWEEN
    # UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) and concatenate in
    # frame order; DISTINCT collapses the per-row copies back to one
    # row per group
    oracle="""
    SELECT DISTINCT region_name,
           string_agg(n_name, ',') OVER (
               PARTITION BY region_name ORDER BY n_name
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS nations
    FROM (SELECT r.r_name AS region_name, n.n_name
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey) j
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list -> array_sort ->
    concat_ws gives a deterministic join independent of row arrival
    order (plain collect_list order is partition-dependent)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
    )


@query(
    "q_data_validation",
    oracle="""
    SELECT 'not_null_c_name' AS rule, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM customer
    UNION ALL
    SELECT 'in_range_c_acctbal', COUNT(*),
           CAST(SUM(CASE WHEN c_acctbal IS NOT NULL
                          AND NOT (c_acctbal BETWEEN -1000 AND 10000)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'accepted_values_c_mktsegment', COUNT(*),
           CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL
                          AND c_mktsegment NOT IN ('MACHINERY','AUTOMOBILE',
                                                   'HOUSEHOLD','BUILDING','FURNITURE')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'unique_c_custkey', (SELECT COUNT(*) FROM customer),
           CAST(COALESCE(SUM(c), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM customer
          GROUP BY c_custkey HAVING COUNT(*) > 1)
    """,
)
def q_data_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (operators/validate.py) — the
    reference's own roadmap gap (reference README.md:50). All
    row-local rules compile into ONE conditional-aggregation scan;
    uniqueness adds one keyed aggregate. Output is the long-form
    (rule, n_rows, n_violations) report."""
    from ..operators.validate import (
        accepted_values,
        in_range,
        not_null,
        unique,
        violations,
    )

    cust = table(spark, sf_dir, "customer")
    rules = [
        not_null("c_name"),
        in_range("c_acctbal", -1000, 10000),
        accepted_values(
            "c_mktsegment",
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"],
        ),
        unique("c_custkey"),
    ]
    return violations(cust, rules)


@query(
    "q_table_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS STRING) AS min_v,
           CAST(MAX(o_orderkey) AS STRING) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS STRING), CAST(MAX(o_custkey) AS STRING)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS STRING),
           CAST(MAX(o_orderstatus) AS STRING)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4)) * 100) AS BIGINT)
                AS STRING),
           CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4)) * 100) AS BIGINT)
                AS STRING)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(MIN(o_orderdate) AS STRING), CAST(MAX(o_orderdate) AS STRING)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS STRING),
           CAST(MAX(o_orderpriority) AS STRING)
    FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile of ``orders``: per-column row/null/
    NDV counts and canonicalized min/max (long format, one row per
    column) — the statistics-collection pass an optimizer's cost model
    and a drift monitor both feed on (operators/profile.py).

    Shape: one PRUNED columnar scan per column, unioned — total bytes
    ≈ one full-width scan, and the per-column jobs run concurrently;
    measured 3x faster than the single wide aggregate whose Expand
    (input ×7) serializes all columns' distinct work into one
    pipeline. Exact NDV is the oracle-checkable form; the documented
    100 TB swap for wide tables is ``exact_ndv=False`` -> HLL++."""
    from ..operators.profile import profile_table

    return profile_table(table(spark, sf_dir, "orders"))


@query("q_pagerank")  # rows-only: iterative float power method
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier purchase graph (edges =
    distinct (o_custkey, l_suppkey) pairs through orders x lineitem):
    which suppliers sit at the center of the purchase network — the
    entity-importance analytics a feature pipeline derives from
    transactional data. Iterative power method (operators/graph.py);
    rows-only because distributed float summation order makes ranks
    engine-specific (pinned vs numpy in tests/test_graph.py).

    Returns the top-50 nodes by rounded rank with a deterministic
    (rank desc, id) order."""
    from ..operators.graph import pagerank

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            # offset suppliers into their own id space so the
            # bipartite graph's node sets cannot collide
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
        .distinct()
    )
    # fixed 8 rounds, tol=0: skips the per-round convergence action
    ranks = pagerank(edges, max_iterations=8, tol=0.0)
    return (
        ranks.select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), "id")
        .limit(50)
    )
