"""Scans, projections, filters, predicates (SURVEY.md §2.1–2.2, §2.6).

Reference lineage: the CSV scan + head(10) limiter (reference
dags/stock_data_airflow_local_aws_s3.py:98-101), the implied
full-history/not-null filter behind company_tick_symbols_processed.csv,
the rename-projection between the raw and processed symbol files, and
the string-cleaning casts the raw screener columns require.

All plain DataFrame ops: Catalyst pushes the filters and projections
into the parquet scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.cleaning import clean_money
from ..registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with projection + predicate, both pushed to the scan."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_filter_limit",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    ORDER BY c_custkey
    LIMIT 10
    """,
)
def q_filter_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered head(10) (reference :101). Spark plans TakeOrderedAndProject —
    no global sort, each partition contributes its local top rows."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(10)
    )


@query(
    "q_filter_predicate",
    oracle="""
    SELECT o_custkey, COUNT(*) AS order_cnt
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-filter over a per-key count — the reference's implied
    'history_cnt == 6225' full-history predicate (SURVEY §2.2 P5/A8)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"))
        .filter(F.col("order_cnt") >= 12)
    )


@query(
    "q_rename_select",
    oracle="""
    SELECT c_custkey AS cust_id, c_name AS company_name, c_mktsegment AS sector
    FROM customer
    """,
)
def q_rename_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename (raw screener -> processed symbols shape:
    Name->Company_Name etc., SURVEY §2.2 P3)."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("company_name"),
        F.col("c_mktsegment").alias("sector"),
    )


@query(
    "q_string_clean_cast",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_replace(concat('$', CAST(c_acctbal AS STRING)), '[$,]', '')
                AS DOUBLE) AS acctbal_clean
    FROM customer
    """,
)
def q_string_clean_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'$-prefixed money string -> double (SURVEY §2.2 P6). The dirty
    string is synthesized in-query (testdata is clean), then cleaned with
    the engine's clean_money projection; round-trip is exact."""
    c = table(spark, sf_dir, "customer")
    money_str = F.concat(F.lit("$"), F.col("c_acctbal").cast("string"))
    return c.select(
        "c_custkey",
        clean_money(money_str).alias("acctbal_clean"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_or_flag,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL) AS bal_is_null
    FROM customer
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / coalesce / isNull predicates (SURVEY §2.2 P7)."""
    c = table(spark, sf_dir, "customer")
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")).alias(
            "seg_or_flag"
        ),
        bal_nonneg.alias("bal_nonneg"),
        bal_nonneg.isNull().alias("bal_is_null"),
    )


@query(
    "q_derive_year",
    oracle="""
    SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    """,
)
def q_derive_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-of-date derived column — the reference's
    stock_data['Year'] = Date.dt.year (reference dags/...aws_s3.py:48)."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )


@query(
    "q_sort",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS sort_rank
    FROM customer
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort, materialized as a rank column so the
    order-insensitive hash still verifies the ordering (SURVEY §2.6 O1).

    The rank comes from the distributed two-phase global rank
    (operators/ranking.py): range-partitioned sort + per-slice offsets,
    identical output to a global row_number with no single-partition
    window — the same query holds on fact tables.
    """
    from ..operators.ranking import _with_global_rank

    cust = table(spark, sf_dir, "customer")
    ranked, _total = _with_global_rank(
        cust, [F.col("c_acctbal").desc(), F.col("c_custkey")], "__rank"
    )
    return ranked.select(
        "c_custkey", "c_acctbal", F.col("__rank").cast("bigint").alias("sort_rank")
    )


@query(
    "q_hash_sample",
    oracle="""
    SELECT doc_id, substr(md5(text), 1, 1) AS md5_head
    FROM documents
    WHERE substr(md5(text), 1, 1) IN ('0', '1')
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 content-hash sample (the reproducible
    train/holdout split a training-data pipeline actually uses —
    TABLESAMPLE is engine- and run-dependent, md5-of-content is not).
    The predicate is a pure per-row projection: no shuffle, prunes to
    (doc_id, text) at the scan."""
    docs = table(spark, sf_dir, "documents")
    head = F.substring(F.md5("text"), 1, 1)
    return docs.filter(head.isin("0", "1")).select(
        "doc_id", head.alias("md5_head")
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL-text interface —
    customers above their nation's average balance. Catalyst
    decorrelates this to an aggregate + join (no per-row re-execution);
    SURVEY §2 'absent categories' notes the engine gets SQL text free.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide -> long): the inverse of q_pivot, a single
    Expand pass with no shuffle."""
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "attr", "val")
    )
