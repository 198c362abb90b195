"""Set operations (SURVEY.md §2.7) — natural on symbol sets: the
reference's processed list is raw-minus-excluded (5,907 rows dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _custkeys_with_status(spark, sf_dir, status):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "q_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets (U1)."""
    return (
        _custkeys_with_status(spark, sf_dir, "F")
        .unionByName(_custkeys_with_status(spark, sf_dir, "P"))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers appearing with both statuses (U2)."""
    return _custkeys_with_status(spark, sf_dir, "F").intersect(
        _custkeys_with_status(spark, sf_dir, "P")
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: all keys minus a probed subset — raw symbols minus
    processed symbols in the reference (U3)."""
    return (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("custkey"))
        .subtract(_custkeys_with_status(spark, sf_dir, "P"))
    )
