"""Window functions (SURVEY.md §2.5) — the feature-engineering surface
for the reference's stock-prediction domain: daily returns, moving
averages, rankings, cumulative stats over per-key ordered history.

All windows partition by a key before ordering, so state stays
per-key-bounded at 100 TB (no global sort; the only global-window
query in the engine is q_sort over a dimension table).

Window frames order by (ts, id) so every frame is deterministic even
with duplicate timestamps. Windowed float sums use exact
DECIMAL(18,4) accumulation, same as the grouped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query

DEC = "decimal(18,4)"


def _per_user() -> Window:
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@query(
    "q_window_lag_return",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value / nullif(lag(value) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id), 0)
                       - 1) * 10000) AS BIGINT) AS ret_bp
    FROM events
    """,
)
def q_window_lag_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-based per-key return: close/lag(close)-1 in the OHLCV domain
    (W1), emitted in integer basis points.

    First row per key keeps a null return (explicit, not dropped); a
    zero previous value also yields null via nullif — portable across
    ANSI (throwing) and non-ANSI engines. floor-of-basis-points rather
    than round(.,4): ratios of 2-decimal inputs land exactly on
    .xxxx5 often enough that HALF_UP tie-breaking diverges between
    engines, while floor of the identical IEEE double is
    bit-deterministic everywhere.
    """
    w = _per_user()
    prev = F.nullif(F.lag("value").over(w), F.lit(0.0))
    ret_bp = F.floor((F.col("value") / prev - 1) * 10000).cast("bigint")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        ret_bp.alias("ret_bp"),
    )


@query(
    "q_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS ma20
    FROM events
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-row moving average per key (W2) — the 20-day SMA shape."""
    w = _per_user().rowsBetween(-19, Window.currentRow)
    ma = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", ma.alias("ma20")
    )


@query(
    "q_rank_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value (W3/O3). row_number with a
    full tiebreak key keeps ranks deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_cumulative_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_qty
    FROM lineitem
    """,
)
def q_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key (W4). The ordering ends with l_quantity:
    larger scale factors contain duplicate (l_orderkey, l_linenumber)
    pairs, and a tie with differing quantities would make the running
    sum order-dependent; with the quantity tiebreak any remaining ties
    are between identical rows, whose swap leaves the output multiset
    unchanged."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("running_qty"),
    )


@query(
    "q_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS wealth_quartile
    FROM customer
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing (W5), via the exact distributed NTILE
    in operators/ranking.py: range-partitioned sort + per-partition
    row_number + partition offsets — identical output to the SQL
    ``ntile`` but with no single-partition window, so the same query
    works on a fact table at 100 TB."""
    from ..operators.ranking import global_ntile

    cust = table(spark, sf_dir, "customer")
    return global_ntile(
        cust, 4, [F.col("c_acctbal").desc(), F.col("c_custkey")], "wealth_quartile"
    ).select("c_custkey", "wealth_quartile")


@query(
    "q_gapfill_daily",
    # dual-dialect: spine via numbers join (user day spans are
    # bounded — pinned in test_sql_text); forward-fill via the
    # count-over-grouping identity instead of IGNORE NULLS, whose
    # placement the two parsers disagree on (Spark postfix, DuckDB
    # in-paren): the running COUNT of non-nulls is constant within a
    # fill group and only one non-null (its first row) exists per
    # group, so MAX over (user, grp) IS the last observation
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*)
               AS day_avg
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, CAST(lo + (n.i - 1) * INTERVAL 1 DAY AS DATE) AS day
      FROM bounds JOIN {D.nums_rel(32)} n
        ON n.i <= {D.days_between('lo', 'hi')} + 1
    ),
    j AS (
      SELECT s.user_id, s.day, d.day_avg,
             COUNT(d.day_avg) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day,
           MAX(day_avg) OVER (PARTITION BY user_id, grp) AS filled_avg,
           day_avg IS NOT NULL AS is_observed
    FROM j
    """,
)
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill / daily resample (operators/resample.py): the
    regularized per-key daily series every OHLCV model needs — one row
    per user per day in their span, missing days forward-filled from
    the last observation. Spine generated JVM-side by sequence();
    fill is a per-key window — one shuffle end to end."""
    from ..functions.exact import davg
    from ..operators.resample import calendar_gapfill

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(davg("value").alias("day_avg"))
    )
    filled = calendar_gapfill(daily, ["user_id"], "day", ["day_avg"])
    return filled.select(
        "user_id", "day", F.col("day_avg").alias("filled_avg"), "is_observed"
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_suppkey ORDER BY CAST(l_shipdate AS DATE)
                          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS qty_30d
    FROM lineitem
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling frame (W6): per-supplier 30-day trailing
    quantity. Spark RANGE frames need a numeric ordering, so the date
    becomes an epoch-day int; DuckDB orders by the date directly with
    an INTERVAL bound — identical row inclusion."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_date(F.col("l_shipdate").cast("date")))
        .rangeBetween(-30, 0)
    )
    return table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("qty_30d"),
    )


@query(
    "q_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_best
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one per-key window (W3
    completeness): rank, dense_rank, percent_rank, cume_dist,
    nth_value. Ratios are quotients of small integers — identical
    doubles on both engines; round(4) guards display-width only."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_best"),
    )
