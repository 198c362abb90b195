"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline
(ikshwakalluri/stock-prediction-data-engineering, surveyed in SURVEY.md).

The reference is an Airflow DAG that fetches per-company OHLCV bars,
partitions them by (company, year) and writes a snappy-Parquet lake
(reference: data_collection/dags/stock_data_airflow_local_aws_s3.py).
This engine re-expresses that surface — plus the full relational /
window / set-op / UDF query surface it implies and the LLM-training-
data extensions (dedup, similarity search, text analysis, multimodal
columns) — as idiomatic Spark DataFrame / SQL programs that Catalyst
plans and optimizes.

Layout:
    session.py    SparkSession factory tuned for local[N] and cluster
    catalog.py    testdata table loading / temp-view registration
    registry.py   declared-query registry (name -> callable, oracle SQL)
    queries/      the declared query set from SURVEY.md §2
    operators/    engine operators (as-of join, dedup family, ANN, text)
    sources/      lake read/write (Hive-partitioned parquet), API source
    functions/    reusable column-expression builders
    plans/        plan-inspection helpers (pushdown / broadcast asserts)
    streaming/    Structured Streaming builders (windows, upsert)
"""

__version__ = "0.1.0"
