"""Stock-domain feature queries — the indicator family the reference's
lake exists to feed ("further analysis ... SageMaker",
/root/reference/README.md:46): VWAP, Bollinger bands, drawdown, RSI.

All rebased onto the driver testdata (`events` as the per-key price
series, `lineitem` as the trade tape) per the FIXTURES.md convention.
Every window partitions by key before ordering — per-key-bounded state
at 100 TB, no global sorts.

Cross-engine float discipline (SURVEY.md §2 legend): component sums
accumulate in exact DECIMAL, the final indicator is one deterministic
double expression written identically on both sides, and the emitted
value is `floor(x * scale)` as BIGINT — floor of a bit-identical IEEE
double is stable where round() half-up tie-breaking is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

DEC = "decimal(18,4)"


def _per_user() -> Window:
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@query(
    "q_vwap",
    oracle="""
    SELECT l_suppkey,
           CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                      * 10000) AS BIGINT) AS vwap_c
    FROM lineitem
    GROUP BY l_suppkey, ship_month
    """,
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per supplier-month: the canonical
    VWAP shape (Σ price·volume / Σ volume) with lineitem as the trade
    tape (extendedprice = price·qty already). One partial+final hash
    aggregate — a single shuffle on the group key at any scale."""
    li = table(spark, sf_dir, "lineitem")
    vwap = (
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
        / F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    )
    return li.groupBy(
        "l_suppkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"),
    ).agg(F.floor(vwap * 10000).cast("bigint").alias("vwap_c"))


@query(
    "q_bollinger_bands",
    oracle="""
    WITH acc AS (
      SELECT event_id, user_id,
             COUNT(value) OVER w AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                      OVER w AS DOUBLE) AS sxx
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(floor((sx / n) * 10000) AS BIGINT) AS mid_c,
           CASE WHEN n > 1 THEN CAST(floor(
               ((sx / n) + 2 * sqrt(greatest((n * sxx - sx * sx) / (n * (n - 1)), 0)))
               * 10000) AS BIGINT) END AS upper_c,
           CASE WHEN n > 1 THEN CAST(floor(
               ((sx / n) - 2 * sqrt(greatest((n * sxx - sx * sx) / (n * (n - 1)), 0)))
               * 10000) AS BIGINT) END AS lower_c
    FROM acc
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-row SMA ± 2σ) per key. The window produces
    only exact accumulators (n, Σx, Σx² in DECIMAL — inputs have ≤2
    decimals so the squares are exact at scale 4); mean/σ/bands are one
    deterministic double expression over them, identical on both
    engines, so the sample-variance algebraic form is safe
    cross-engine. Single rows frame reused by all three accumulators —
    one shuffle + one in-partition sort."""
    d2 = "decimal(18,2)"
    w = _per_user().rowsBetween(-19, Window.currentRow)
    v = F.col("value").cast(d2)
    n = F.count("value").over(w)
    sx = F.sum(v).over(w).cast("double")
    sxx = F.sum(v * v).over(w).cast("double")
    mid = sx / n
    # nullif keeps ANSI mode from throwing on the n=1 rows; their
    # upper/lower bands are masked to NULL below either way
    var = F.greatest(
        (n * sxx - sx * sx) / F.nullif(n * (n - 1), F.lit(0)), F.lit(0.0)
    )
    sd = F.sqrt(var)
    return (
        table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            n.alias("n"),
            mid.alias("mid"),
            sd.alias("sd"),
        )
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("mid") * 10000).cast("bigint").alias("mid_c"),
            F.when(
                F.col("n") > 1,
                F.floor((F.col("mid") + 2 * F.col("sd")) * 10000).cast("bigint"),
            ).alias("upper_c"),
            F.when(
                F.col("n") > 1,
                F.floor((F.col("mid") - 2 * F.col("sd")) * 10000).cast("bigint"),
            ).alias("lower_c"),
        )
    )


@query(
    "q_drawdown",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value / CAST(MAX(CAST(value AS DECIMAL(18,4))) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                - 1) * 10000) AS BIGINT) AS drawdown_bp
    FROM events
    """,
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row drawdown from the running peak (value/runmax − 1, in
    basis points) — the risk metric behind max-drawdown backtests.
    Running MAX over DECIMAL is exact; values are strictly positive in
    the testdata so the ratio is well-defined. One per-key window."""
    w = _per_user().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runmax = F.max(F.col("value").cast(DEC)).over(w).cast("double")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor((F.col("value") / runmax - 1) * 10000)
        .cast("bigint")
        .alias("drawdown_bp"),
    )


@query(
    "q_rsi",
    oracle="""
    WITH diffs AS (
      SELECT event_id, user_id, ts,
             CAST(value AS DECIMAL(18,4))
               - lag(CAST(value AS DECIMAL(18,4))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS diff
      FROM events
    ),
    sums AS (
      SELECT event_id, user_id,
             SUM(CASE WHEN diff > 0 THEN diff ELSE CAST(0 AS DECIMAL(18,4)) END)
                 OVER w AS gain_s,
             SUM(CASE WHEN diff < 0 THEN -diff ELSE CAST(0 AS DECIMAL(18,4)) END)
                 OVER w AS loss_s
      FROM diffs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(floor(100 * CAST(gain_s AS DOUBLE)
                      / CAST(nullif(gain_s + loss_s, 0) AS DOUBLE) * 100) AS BIGINT)
               AS rsi_c
    FROM sums
    """,
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI per key, in the division-safe form
    100·gains/(gains+losses) (algebraically equal to 100−100/(1+RS)).
    Gains/losses accumulate as exact DECIMAL window sums over lag
    diffs; a flat window (gains+losses = 0) yields NULL via nullif on
    the exact decimal — no float-epsilon ambiguity. Two stacked
    windows share one (user_id) partitioning: a single shuffle."""
    wl = _per_user()
    w = wl.rowsBetween(-13, Window.currentRow)
    v = F.col("value").cast(DEC)
    diff = v - F.lag(v).over(wl)
    zero = F.lit(0).cast(DEC)
    d = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        diff.alias("diff"),
    )
    gain_s = F.sum(
        F.when(F.col("diff") > 0, F.col("diff")).otherwise(zero)
    ).over(w)
    loss_s = F.sum(
        F.when(F.col("diff") < 0, -F.col("diff")).otherwise(zero)
    ).over(w)
    d = d.select(
        "event_id", "user_id", gain_s.alias("gain_s"), loss_s.alias("loss_s")
    )
    rsi = (
        100
        * F.col("gain_s").cast("double")
        / F.nullif(F.col("gain_s") + F.col("loss_s"), F.lit(0).cast(DEC)).cast(
            "double"
        )
    )
    return d.select(
        "event_id",
        "user_id",
        F.floor(rsi * 100).cast("bigint").alias("rsi_c"),
    )


@query(
    "q_market_beta",
    oracle="""
    WITH user_day AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,4))) AS s, COUNT(*) AS c
      FROM events GROUP BY user_id, day
    ),
    market AS (
      SELECT day,
             CAST(floor(CAST(SUM(s) AS DOUBLE) / SUM(c) * 10000) AS BIGINT) AS m
      FROM user_day GROUP BY day
    ),
    j AS (
      SELECT u.user_id,
             CAST(floor(CAST(u.s AS DOUBLE) / u.c * 10000) AS BIGINT) AS x,
             md.m
      FROM user_day u JOIN market md USING (day)
    ),
    comp AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(x) AS sx, SUM(m) AS sm, SUM(x * m) AS sxm, SUM(m * m) AS smm
      FROM j GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_days,
           CAST(floor(CAST(n * sxm - sx * sm AS DOUBLE)
                      / CAST(nullif(n * smm - sm * sm, 0) AS DOUBLE)
                      * 10000) AS BIGINT) AS beta_c
    FROM comp
    """,
)
def q_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key market beta: regress each key's daily average against
    the same-day market-wide average (cov/var over integer-scaled
    day values — every component sum is exact, the one division is a
    deterministic double). The market series derives from the SAME
    per-(user, day) aggregate the per-user series uses — one scan of
    events, a tiny broadcast join on day, then one keyed aggregate:
    three shuffles total and nothing global at any scale."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.col("value").cast(DEC).alias("v"),
    )
    user_day = ev.groupBy("user_id", "day").agg(
        F.sum("v").alias("s"), F.count("*").alias("c")
    )
    market = user_day.groupBy("day").agg(
        F.floor(F.sum("s").cast("double") / F.sum("c") * 10000)
        .cast("bigint")
        .alias("m")
    )
    j = user_day.select(
        "user_id",
        "day",
        F.floor(F.col("s").cast("double") / F.col("c") * 10000)
        .cast("bigint")
        .alias("x"),
    ).join(F.broadcast(market), "day")
    comp = j.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
    )
    num = (F.col("n") * F.col("sxm") - F.col("sx") * F.col("sm")).cast("double")
    den = F.nullif(
        F.col("n") * F.col("smm") - F.col("sm") * F.col("sm"), F.lit(0)
    ).cast("double")
    return comp.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_days"),
        F.floor(num / den * 10000).cast("bigint").alias("beta_c"),
    )


@query(
    "q_feature_matrix",
    oracle="""
    WITH acc AS (
      SELECT event_id, user_id, value,
             lag(CAST(value AS DECIMAL(18,4))) OVER wl AS prev_v,
             lag(CAST(value AS DECIMAL(18,4)), 10) OVER wl AS prev10_v,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w5 AS DOUBLE)
                 / COUNT(value) OVER w5 AS ma5,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w20 AS DOUBLE)
                 / COUNT(value) OVER w20 AS ma20,
             COUNT(value) OVER w20 AS n20,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                      OVER w20 AS DOUBLE) AS sxx
      FROM events
      WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id),
             w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w20 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(floor((value / CAST(nullif(prev_v, 0) AS DOUBLE) - 1) * 10000)
                AS BIGINT) AS ret_bp,
           CAST(floor(ma5 * 10000) AS BIGINT) AS ma5_c,
           CAST(floor(ma20 * 10000) AS BIGINT) AS ma20_c,
           CASE WHEN n20 > 1 THEN CAST(floor(
               sqrt(greatest((n20 * sxx - sx * sx) / (n20 * (n20 - 1)), 0))
               * 10000) AS BIGINT) END AS vol20_c,
           CAST((CAST(value AS DECIMAL(18,4)) - prev10_v) AS DOUBLE) AS mom10
    FROM acc
    """,
)
def q_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass feature assembly — the shape a training pipeline runs
    nightly over every symbol: lag return, 5/20-row moving averages,
    20-row volatility, 10-step momentum. Every frame shares the ONE
    (user_id)/(ts, event_id) window partitioning, so five features
    cost exactly one shuffle + one in-partition sort (pinned in
    tests/test_plan_shapes.py) — adding a feature to this matrix is
    marginal-cost-zero in data movement at any scale."""
    d2 = "decimal(18,2)"
    wl = _per_user()
    w5 = wl.rowsBetween(-4, Window.currentRow)
    w20 = wl.rowsBetween(-19, Window.currentRow)
    v = F.col("value")
    vdec = v.cast(DEC)
    v2 = v.cast(d2)
    acc = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag(vdec).over(wl).alias("prev_v"),
        F.lag(vdec, 10).over(wl).alias("prev10_v"),
        (F.sum(vdec).over(w5).cast("double") / F.count("value").over(w5)).alias(
            "ma5"
        ),
        (F.sum(vdec).over(w20).cast("double") / F.count("value").over(w20)).alias(
            "ma20"
        ),
        F.count("value").over(w20).alias("n20"),
        F.sum(v2).over(w20).cast("double").alias("sx"),
        F.sum(v2 * v2).over(w20).cast("double").alias("sxx"),
    )
    n20, sx, sxx = F.col("n20"), F.col("sx"), F.col("sxx")
    var = F.greatest(
        (n20 * sxx - sx * sx) / F.nullif(n20 * (n20 - 1), F.lit(0)), F.lit(0.0)
    )
    return acc.select(
        "event_id",
        "user_id",
        F.floor(
            (F.col("value") / F.nullif(F.col("prev_v"), F.lit(0).cast(DEC)).cast("double") - 1)
            * 10000
        )
        .cast("bigint")
        .alias("ret_bp"),
        F.floor(F.col("ma5") * 10000).cast("bigint").alias("ma5_c"),
        F.floor(F.col("ma20") * 10000).cast("bigint").alias("ma20_c"),
        F.when(n20 > 1, F.floor(F.sqrt(var) * 10000).cast("bigint")).alias(
            "vol20_c"
        ),
        (F.col("value").cast(DEC) - F.col("prev10_v")).cast("double").alias("mom10"),
    )


@query(
    "q_ohlc_candles",
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM ranked
    GROUP BY user_id, day
    """,
)
def q_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candle building — THE bars operation of the reference's domain
    (its lake stores exactly these per-day OHLCV rows,
    dags/stock_data_airflow_local_aws_s3.py:36-42): aggregate a tick
    stream into per-key daily open/high/low/close/volume. First/last
    tick via two row_numbers over the same (key, day) partitioning
    (one shuffle, shared sort) folded with conditional aggregates —
    min/max/count ride the same hash aggregate. Values are raw column
    picks (no float arithmetic), so cross-engine parity is exact."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id", "value"
    )
    wa = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_ticks"),
    )


@query("q_ema_macd")
def q_ema_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA / MACD indicator stack per key (operators/ewm.py): the
    per-key exponential recurrence Spark SQL windows cannot express,
    run as an Arrow-batched grouped map. Rows-only by design — the
    recurrence has no ANSI-SQL oracle; tests/test_finance.py checks
    it against an explicit brute-force recurrence instead."""
    from ..operators.ewm import macd_features

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = macd_features(ev, ["user_id"], ["ts", "event_id"], "value")
    return out.select(
        "event_id",
        "user_id",
        "ema_fast",
        "ema_slow",
        "macd",
        "macd_signal",
        "macd_hist",
    )


@query(
    "q_rolling_corr",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT) AS x
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    mkt AS (
      SELECT day, CAST(SUM(x) AS BIGINT) AS mx FROM daily GROUP BY day
    ),
    j AS (
      SELECT d.user_id, d.day, d.x, m.mx FROM daily d JOIN mkt m USING (day)
    ),
    comp AS (
      SELECT user_id, day,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx, SUM(mx) OVER w AS sy,
             SUM((CAST(x AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0)))) OVER w AS sxy,
             SUM((CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))) OVER w AS sxx,
             SUM((CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0)))) OVER w AS syy
      FROM j
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, CAST(n AS BIGINT) AS n_days,
           CAST(floor(
             CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(sxy AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                  - (CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))) AS DOUBLE)
             / sqrt(CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(sxx AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                         - (CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))) AS DOUBLE)
                    * CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(syy AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                           - (CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))) AS DOUBLE))
             * 1000000) AS BIGINT) AS corr_ppm
    FROM comp
    WHERE n >= 5
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-day correlation of each key's daily series against
    the market composite — the windowed refinement of q_market_beta
    (full-history beta) that drift monitors and pairs-trading screens
    actually use: how co-moving is this series with the market *right
    now*.

    Scale shape: the fact table compresses to (user, day) once; the
    market series is |days| rows and broadcasts back onto it; then ONE
    window exchange keyed by user_id computes all six component sums
    over the same 20-row frame. Component sums are exact BIGINTs in
    integer cents; the final combination widens to DECIMAL(38,0)
    (exact) and collapses in the same token-identical double
    expression q_event_corr pins, floor-scaled to ppm. Frames shorter
    than 5 days are suppressed (undefined early-window correlation).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("bigint").alias("x")
    )
    mkt = daily.groupBy("day").agg(F.sum("x").cast("bigint").alias("mx"))
    j = daily.join(F.broadcast(mkt), "day")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-19, 0)
    )
    # product terms widen BEFORE multiplying: mx is a sum over ALL
    # users, so mx^2 grows quadratically with corpus size and overflows
    # int64 around sf10 (measured: ArithmeticException in the sf10
    # sweep). decimal(19,0) operands make every long x long product
    # exact in decimal(38,0) — the same widening the oracle gets from
    # HUGEINT — while sx/sy stay cheap longs
    xd = F.col("x").cast("decimal(19,0)")
    mxd = F.col("mx").cast("decimal(19,0)")
    comp = j.select(
        "user_id",
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("mx").over(w).alias("sy"),
        F.sum(xd * mxd).over(w).alias("sxy"),
        F.sum(xd * xd).over(w).alias("sxx"),
        F.sum(mxd * mxd).over(w).alias("syy"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * d38("sxy") - d38("sx") * d38("sy")).cast("double")
    dx = (d38("n") * d38("sxx") - d38("sx") * d38("sx")).cast("double")
    dy = (d38("n") * d38("syy") - d38("sy") * d38("sy")).cast("double")
    return comp.filter(F.col("n") >= 5).select(
        "user_id",
        "day",
        F.col("n").cast("bigint").alias("n_days"),
        F.floor(num / F.sqrt(dx * dy) * 1000000).cast("bigint").alias("corr_ppm"),
    )


_BARS_SQL = """
    ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ),
    bars AS (
      SELECT user_id, day,
             MAX(CASE WHEN rn_d = 1 THEN v_c END) AS close_c,
             MAX(v_c) AS high_c, MIN(v_c) AS low_c
      FROM ranked GROUP BY user_id, day
    )
"""


def _daily_bars_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) OHLC bars in integer cents — the shared input
    of the true-range indicators (same shape as q_ohlc_candles)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("v_c"),
    )
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn_d", F.row_number().over(wd))
        .groupBy("user_id", "day")
        .agg(
            F.max(F.when(F.col("rn_d") == 1, F.col("v_c"))).alias("close_c"),
            F.max("v_c").alias("high_c"),
            F.min("v_c").alias("low_c"),
        )
    )


@query(
    "q_atr",
    oracle=f"""
    WITH {_BARS_SQL},
    tr AS (
      SELECT user_id, day,
             CASE WHEN lag(close_c) OVER w IS NULL THEN high_c - low_c
                  ELSE GREATEST(high_c - low_c,
                                abs(high_c - lag(close_c) OVER w),
                                abs(low_c - lag(close_c) OVER w)) END AS tr_c
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id, day,
           CAST((SUM(tr_c) OVER w14 - (SUM(tr_c) OVER w14
                                      % COUNT(*) OVER w14))
                / COUNT(*) OVER w14 AS BIGINT) AS atr_c
    FROM tr
    WINDOW w14 AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
)
def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range (Wilder, simple-mean variant): true range =
    max of today's span and both gap distances to yesterday's close,
    averaged over a trailing 14-bar frame. Everything is integer
    cents — TR is a max of integer differences and the mean is one
    floor division of non-negative integers, identical across engines.

    Plan: the daily-bar collapse shuffles by (user, day) once; the lag
    and the trailing mean ride ONE keyed (user) sort — per-key-bounded
    state, no global ordering."""
    bars = _daily_bars_cents(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("day")
    pc = F.lag("close_c").over(w)
    tr = F.when(pc.isNull(), F.col("high_c") - F.col("low_c")).otherwise(
        F.greatest(
            F.col("high_c") - F.col("low_c"),
            F.abs(F.col("high_c") - pc),
            F.abs(F.col("low_c") - pc),
        )
    )
    t = bars.withColumn("tr_c", tr)
    return t.select(
        "user_id",
        "day",
        F.expr(
            "sum(tr_c) OVER (PARTITION BY user_id ORDER BY day"
            " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
            " div count(*) OVER (PARTITION BY user_id ORDER BY day"
            " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
        )
        .cast("bigint")
        .alias("atr_c"),
    )


@query(
    "q_stochastic_osc",
    oracle=f"""
    WITH {_BARS_SQL},
    k AS (
      SELECT user_id, day,
             CASE WHEN MAX(high_c) OVER w14 = MIN(low_c) OVER w14 THEN NULL
                  ELSE ((close_c - MIN(low_c) OVER w14) * 10000
                         - ((close_c - MIN(low_c) OVER w14) * 10000)
                           % (MAX(high_c) OVER w14 - MIN(low_c) OVER w14))
                       / (MAX(high_c) OVER w14 - MIN(low_c) OVER w14)
             END AS k_bp
      FROM bars
      WINDOW w14 AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, CAST(k_bp AS BIGINT) AS k_bp,
           CAST(CASE WHEN COUNT(k_bp) OVER w3 = 0 THEN NULL
                     ELSE (SUM(k_bp) OVER w3 - (SUM(k_bp) OVER w3
                                                % COUNT(k_bp) OVER w3))
                          / COUNT(k_bp) OVER w3
                END AS BIGINT) AS d_bp
    FROM k
    WINDOW w3 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator: %K locates today's close inside the
    trailing 14-bar high-low channel (basis points, one floor division
    of non-negative integers); %D is the 3-bar mean of %K. A flat
    channel (high == low over the whole frame) yields NULL rather than
    a 0/0.

    Plan: both frames ride the same keyed (user, day-order) sort as
    every indicator in this module — adding an indicator to the stack
    is marginal-cost-zero in shuffles."""
    bars = _daily_bars_cents(spark, sf_dir)
    w14 = (
        "PARTITION BY user_id ORDER BY day"
        " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW"
    )
    w3 = (
        "PARTITION BY user_id ORDER BY day"
        " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
    )
    k = bars.select(
        "user_id",
        "day",
        F.expr(
            f"CASE WHEN max(high_c) OVER ({w14}) = min(low_c) OVER ({w14})"
            f" THEN NULL"
            f" ELSE (close_c - min(low_c) OVER ({w14})) * 10000"
            f"      div (max(high_c) OVER ({w14}) - min(low_c) OVER ({w14}))"
            f" END"
        )
        .cast("bigint")
        .alias("k_bp"),
    )
    return k.select(
        "user_id",
        "day",
        "k_bp",
        F.expr(
            f"CASE WHEN count(k_bp) OVER ({w3}) = 0 THEN NULL"
            f" ELSE sum(k_bp) OVER ({w3}) div count(k_bp) OVER ({w3}) END"
        )
        .cast("bigint")
        .alias("d_bp"),
    )
