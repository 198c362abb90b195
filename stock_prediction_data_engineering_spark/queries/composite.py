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

    In Spark the *work* partitioning the batches provided is subsumed by
    tasks; this keeps the ids reproducible as data. The global
    row_number is dimension-table-sized here; the scale path is
    zipWithIndex-style monotonically-increasing ids per range partition.
    """
    w = Window.orderBy("c_custkey")
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.floor((F.row_number().over(w) - 1) / 100) + 1).cast("int").alias("batch_id"),
    )
