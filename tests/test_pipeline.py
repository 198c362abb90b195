"""End-to-end replay of the reference's DAG (CSV -> fetch -> lake ->
processed symbols), asserting the golden-artifact invariants from
SURVEY.md §2.9 on the output."""

from __future__ import annotations

import glob

DIRTY_CSV = """Symbol,Name,Last Sale,Net Change,% Change,Market Cap,Country,IPO Year,Volume,Sector,Industry
AAA,Alpha Inc,"$146.865",0.75,"0.208%",1000000,USA,1999,5000,Technology,Software
BBB,Beta Corp,"$12.50",-0.10,"-0.80%",2000000,USA,2005,800,Finance,Banks
CCC,Gamma Ltd,"$99.00",0.00,"0.00%",3000000,UK,2010,1200,,Unknown
DDD^,Delta Units,"$5.00",0.01,"0.20%",40000,USA,2015,100,Energy,Oil
,Null Sym,"$1.00",0.00,"0.00%",1,USA,2020,1,Misc,Misc
EEE,Epsilon SA,"$7.77",0.07,"0.77%",70000,FR,2001,700,Health,Pharma
FLAKY,Flaky Co,"$3.33",0.03,"0.33%",30000,USA,2003,300,Technology,Hardware
"""


def test_pipeline_replays_reference_dag(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark import pipeline
    from stock_prediction_data_engineering_spark.sources.api_source import synthetic_fetch

    root = tmp_path_factory.mktemp("refdag")
    csv_path = str(root / "screener.csv")
    with open(csv_path, "w") as f:
        f.write(DIRTY_CSV)
    lake = str(root / "lake")

    def flaky(sym, start, end):
        if sym == "FLAKY":
            raise RuntimeError("rate limited")
        return synthetic_fetch(sym, start, end)

    processed = pipeline.run(
        spark, csv_path, lake, start="2024-01-01", end="2024-03-01", fetch_fn=flaky
    )
    rows = processed.collect()

    # golden-artifact invariants (SURVEY.md §2.9):
    syms = [r.Symbol for r in rows]
    assert syms == sorted(syms)                       # sorted by Symbol
    assert set(syms) == {"AAA", "BBB", "EEE"}         # subset of raw:
    #   CCC dropped (null sector), DDD^ dropped (non-ticker symbol),
    #   null-symbol row dropped, FLAKY dropped (no complete history)
    assert len({r.History_Existing for r in rows}) == 1   # uniform full history
    assert all(r.Data_Exising for r in rows)
    assert all(r.Sector is not None for r in rows)
    assert processed.columns == [
        "Symbol", "Company_Name", "Sector", "Data_Exising",
        "History_Existing", "IPO_Year", "Country", "Industry",
    ]

    # the lake has the reference's company=/year= layout, quarantined
    # symbol excluded, and partition pruning applies on read
    files = glob.glob(f"{lake}/company=*/year=*/*.parquet")
    assert files and not glob.glob(f"{lake}/company=FLAKY/*")
    one = spark.read.parquet(lake).filter(
        (F.col("company") == "AAA") & (F.col("year") == 2024)
    )
    assert one.count() == 30
    assert "PartitionFilters: [isnotnull(company" in \
        one._jdf.queryExecution().executedPlan().toString()


def test_pipeline_fetches_each_symbol_once(spark, tmp_path_factory):
    """run() must execute the fetch stage exactly once per symbol: the
    probe aggregates the WRITTEN lake, not the un-cached fetch
    DataFrame (which would re-run fetch_fn for every symbol)."""
    from stock_prediction_data_engineering_spark import pipeline
    from stock_prediction_data_engineering_spark.sources.api_source import synthetic_fetch

    root = tmp_path_factory.mktemp("fetchonce")
    csv_path = str(root / "screener.csv")
    with open(csv_path, "w") as f:
        f.write(DIRTY_CSV)
    calls_log = str(root / "calls.log")

    def counting(sym, start, end):
        # fetch runs in Python worker processes: count via file appends
        with open(calls_log, "a") as fh:
            fh.write(sym + "\n")
        return synthetic_fetch(sym, start, end)

    pipeline.run(
        spark, csv_path, str(root / "lake"),
        start="2024-01-01", end="2024-02-01", fetch_fn=counting,
    )
    with open(calls_log) as fh:
        calls = sorted(line.strip() for line in fh)
    # 5 clean-symbol rows in DIRTY_CSV (AAA BBB CCC EEE FLAKY); each
    # fetched exactly once
    assert calls == ["AAA", "BBB", "CCC", "EEE", "FLAKY"], calls


def test_pipeline_rerun_is_idempotent(spark, tmp_path_factory):
    """A second run() over the same lake path is overwrite-equal — the
    reference's batch-retry semantics (dags/...aws_s3.py:18,
    README.md:67) without manual cleanup."""
    from stock_prediction_data_engineering_spark import pipeline
    from stock_prediction_data_engineering_spark.sources.api_source import synthetic_fetch

    root = tmp_path_factory.mktemp("rerun")
    csv_path = str(root / "screener.csv")
    with open(csv_path, "w") as f:
        f.write(DIRTY_CSV)
    lake = str(root / "lake")

    args = dict(start="2024-01-01", end="2024-02-01", fetch_fn=synthetic_fetch)
    first = pipeline.run(spark, csv_path, lake, **args).collect()
    lake_rows_1 = spark.read.parquet(lake).count()
    second = pipeline.run(spark, csv_path, lake, **args).collect()
    lake_rows_2 = spark.read.parquet(lake).count()

    assert first == second
    assert lake_rows_1 == lake_rows_2 > 0
