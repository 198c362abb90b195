"""Scalar function families (SURVEY.md §2.8, §2.10).

Reference lineage: year extraction (.dt.year, reference
dags/...aws_s3.py:48), path/key string formatting (f-strings :55,:61,
:83), numeric change columns in the raw screener, and the per-symbol
Python function that is the reference's de-facto UDF surface.

Everything except q_scalar_udf is a built-in JVM expression inside
whole-stage codegen; the UDF is an Arrow-vectorized pandas_udf.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query


@query(
    "q_date_functions",
    # dual dialect (round-8): date_diff('day',..) via the interval-day
    # extract; strftime('%Y-%m') via substring of the canonical date
    # rendering (identical in both engines)
    oracle=f"""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST({D.days_between('o_orderdate', "TIMESTAMP '1998-01-01'")} AS INTEGER)
               AS days_to_cutoff,
           substring(CAST(o_orderdate AS STRING), 1, 7) AS order_month
    FROM orders
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (F1): extract, diff, truncate-format."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_cutoff"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )


@query(
    "q_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           split_part(c_name, '#', 2) AS cust_num_str,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_num_re
    FROM customer
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (F2): case, substring, length, concat, split,
    regexp extract — the reference's path/key formatting expressed as
    column ops."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.split("c_name", "#").getItem(1).alias("cust_num_str"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_num_re"),
    )


@query(
    "q_math_functions",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal) AS abs_bal,
           round(c_acctbal, 0) AS round_bal,
           round(ln(abs(c_acctbal) + 1), 4) AS log_bal,
           round(sqrt(abs(c_acctbal)), 4) AS sqrt_bal,
           c_acctbal * c_acctbal AS bal_sq
    FROM customer
    """,
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (F3)."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.round(bal, 0).alias("round_bal"),
        F.round(F.log(F.abs(bal) + 1), 4).alias("log_bal"),
        F.round(F.sqrt(F.abs(bal)), 4).alias("sqrt_bal"),
        (bal * bal).alias("bal_sq"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY bal_band
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + aggregation (F4) — the Data_Exising boolean
    derivation generalized."""
    from ..functions.exact import dsum

    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        table(spark, sf_dir, "customer")
        .groupBy(band.alias("bal_band"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_bal"))
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (F5): positional explode of the embedding column.
    float->double widening is exact, so values hash identically."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (F6): extract a typed field from the events.props
    JSON string."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "q_scalar_udf",
    oracle="""
    SELECT event_id, round(value * 0.8 + 10, 4) AS adj_value
    FROM events
    """,
)
def q_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (D1) — the engine's slow-path
    escape hatch, oracle-checked against the equivalent SQL expression.
    Row-at-a-time F.udf is deliberately not used anywhere in the engine.
    """

    @F.pandas_udf("double")
    def adj(value: pd.Series) -> pd.Series:
        return (value * 0.8 + 10).round(4)

    return table(spark, sf_dir, "events").select(
        "event_id", adj("value").alias("adj_value")
    )


@query(
    "q_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_comp
    FROM embeddings
    """,
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions beyond explode (F5 completeness):
    filter + transform + aggregate folds and array_max, all JVM-side
    lambda expressions inside whole-stage codegen — the idiom every
    embedding-column pipeline leans on. Fold order is array order on
    both engines, so the double accumulation is deterministic."""
    emb = table(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(sq_norm, 4).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_comp"),
    )


@query(
    "q_map_functions",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           json_extract(props, '$.missing') IS NULL AS k_missing
    FROM events
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed processing (F6 completeness): parse the JSON props
    into a MapType column, then key-cardinality, element_at lookup,
    and missing-key semantics — the map side of the JSON surface
    (q_json_extract covers scalar extraction)."""
    from pyspark.sql.types import MapType, StringType

    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), StringType()))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").cast("bigint").alias("k_value"),
        F.element_at(m, "missing").isNull().alias("k_missing"),
    )
