"""Statistical analytics over the event stream: time-weighted
averages, pairwise series correlation, exact anomaly gating, and
fixed-width histograms.

Cross-engine float discipline (registry header): every component sum
is an exact integer/DECIMAL; each query emits at most ONE double
expression, written token-identically in the DuckDB oracle; anomaly
gating avoids floats entirely (the variance inequality is cleared of
divisions, so the comparison is exact integer algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query

DEC = "decimal(18,4)"


@query(
    "q_twap",
    # dual dialect (round-8): date_diff('microsecond',..) == the
    # epoch_us difference (functions/dual_sql.py); lead rides a CTE
    # column so the macro wraps plain columns
    oracle=f"""
    WITH l AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    seq AS (
      SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v,
             {D.epoch_us('next_ts')} - {D.epoch_us('ts')} AS dt_us
      FROM l
    )
    SELECT user_id,
           CAST(COUNT(dt_us) AS BIGINT) AS n_intervals,
           CAST(floor(CAST(SUM(v * dt_us) AS DOUBLE)
                      / CAST(SUM(dt_us) AS DOUBLE) * 10000) AS BIGINT)
             AS twap_c
    FROM seq
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per key: each observation holds
    until the next one, so it is weighted by its interval length
    (exact integer microseconds) — the TWAP shape used for irregular
    tick series, where a plain mean over-weights bursts.

    One per-key window (lead) followed by a keyed aggregate on the
    SAME key — the aggregate reuses the window's hash partitioning,
    so the whole query is a single exchange at any scale. Weighted
    sums accumulate in DECIMAL x BIGINT (exact); the one double
    division is floor-scaled identically in the oracle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("value").cast(DEC).alias("v"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "dt_us"
        ),
    )
    return (
        seq.filter(F.col("dt_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("dt_us").cast("bigint").alias("n_intervals"),
            F.floor(
                F.sum(F.col("v") * F.col("dt_us")).cast("double")
                / F.sum("dt_us").cast("double")
                * 10000
            )
            .cast("bigint")
            .alias("twap_c"),
        )
    )


@query(
    "q_event_corr",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.x AS xa, b.x AS xb
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
    ),
    comp AS (
      SELECT type_a, type_b, COUNT(*) AS n,
             SUM(xa) AS sx, SUM(xb) AS sy,
             SUM((CAST(xa AS DECIMAL(19,0)) * CAST(xb AS DECIMAL(19,0)))) AS sxy,
             SUM((CAST(xa AS DECIMAL(19,0)) * CAST(xa AS DECIMAL(19,0)))) AS sxx,
             SUM((CAST(xb AS DECIMAL(19,0)) * CAST(xb AS DECIMAL(19,0)))) AS syy
      FROM pairs GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CAST(floor(
             CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(sxy AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                  - (CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))) AS DOUBLE)
             / sqrt(CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(sxx AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                         - (CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))) AS DOUBLE)
                    * CAST((CAST(n AS DECIMAL(8,0)) * CAST(CAST(syy AS DECIMAL(30,0)) AS DECIMAL(30,0)))
                           - (CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))) AS DOUBLE))
             * 1000000) AS BIGINT) AS corr_ppm
    FROM comp
    """,
)
def q_event_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event-type daily series —
    the cross-asset correlation matrix in the stock domain.

    Scale shape: one keyed aggregate compresses the fact table to a
    (type, day) series — the ONLY pass over raw data — then the
    self-join and the component aggregate run on the tiny compressed
    series. K series means K(K-1)/2 pairs of day-rows, never a fact-
    table cross join. Component sums (n, Σx, Σy, Σxy, Σx², Σy²) are
    exact BIGINTs in integer cents; the final combination is widened
    to DECIMAL(38,0) (still exact) and collapsed in one deterministic
    double expression — numerator / sqrt(dx·dy) — floor-scaled to ppm.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.sum(F.col("value").cast(DEC)) * 100).cast("bigint").alias("x"))
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("x").alias("xb")
    )
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    # per-(type, day) totals grow linearly with corpus size, so their
    # products overflow int64 around sf10-sf100; decimal(19,0)
    # operands make the products exact decimal(38,0) (oracle: HUGEINT)
    xad = F.col("xa").cast("decimal(19,0)")
    xbd = F.col("xb").cast("decimal(19,0)")
    comp = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(xad * xbd).alias("sxy"),
        F.sum(xad * xad).alias("sxx"),
        F.sum(xbd * xbd).alias("syy"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * d38("sxy") - d38("sx") * d38("sy")).cast("double")
    dx = (d38("n") * d38("sxx") - d38("sx") * d38("sx")).cast("double")
    dy = (d38("n") * d38("syy") - d38("sy") * d38("sy")).cast("double")
    return comp.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_days"),
        F.floor(num / F.sqrt(dx * dy) * 1000000).cast("bigint").alias("corr_ppm"),
    )


@query(
    "q_anomaly_gate",
    oracle="""
    WITH cents AS (
      SELECT event_id, user_id, value,
             CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS xc
      FROM events
    ),
    stats AS (
      SELECT user_id, COUNT(*) AS n, SUM(xc) AS s, SUM(xc * xc) AS s2
      FROM cents GROUP BY user_id
    )
    SELECT c.event_id, c.user_id, c.value
    FROM cents c JOIN stats t USING (user_id)
    WHERE t.n >= 3
      AND (c.xc * t.n - t.s) * (c.xc * t.n - t.s)
          > 4 * (t.n * t.s2 - t.s * t.s)
    """,
)
def q_anomaly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key outlier gate: events more than 2 sigma from their key's
    mean — with the inequality (x-mu)^2 > 4*sigma^2 cleared of
    divisions to (x*n - s)^2 > 4*(n*s2 - s^2), so the entire test is
    EXACT integer algebra in cents: no float, no sqrt, bit-identical
    on any engine.

    Two passes over the key's rows (stats aggregate, then the gate
    join) — both keyed on user_id, so the join inherits the
    aggregate's partitioning; at 100 TB the stats side is one row per
    key and broadcast-eligible.
    """
    ev = table(spark, sf_dir, "events")
    cents = ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("xc"),
    )
    stats = cents.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("s"),
        F.sum(F.col("xc") * F.col("xc")).alias("s2"),
    )
    dev = F.col("xc") * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    return (
        cents.join(stats, "user_id")
        .filter((F.col("n") >= 3) & (dev * dev > var4))
        .select("event_id", "user_id", "value")
    )


@query(
    "q_moment_stats",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS xc
      FROM events
    ),
    comp AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(xc) AS DECIMAL(38,0)) AS s1,
             SUM(CAST((CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DECIMAL(19,0))) AS s2,
             SUM((CAST(xc AS DECIMAL(19,0)) * CAST(CAST((CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS DECIMAL(19,0)))) AS s3,
             SUM((CAST(CAST((CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS DECIMAL(19,0)) * CAST(CAST((CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS DECIMAL(19,0)))) AS s4
      FROM cents GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           CAST(floor(CAST(s1 AS DOUBLE) / n * 100) AS BIGINT) AS mean_x100,
           CAST(floor((CAST(s3 AS DOUBLE) / n
                       - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                       + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                      / ((CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                         * sqrt(CAST(s2 AS DOUBLE) / n
                                - (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n)))
                      * 1000000) AS BIGINT) AS skew_ppm,
           CAST(floor(((CAST(s4 AS DOUBLE) / n
                        - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                        + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s2 AS DOUBLE) / n)
                        - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                       / ((CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                          * (CAST(s2 AS DOUBLE) / n
                             - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n)))
                       - 3) * 1000000) AS BIGINT) AS kurt_ppm
    FROM comp
    WHERE n >= 3
    """,
)
def q_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed higher-moment statistics per event type:
    skewness and excess kurtosis from raw power sums (n, Σx, Σx², Σx³,
    Σx⁴) — the one-pass mergeable form (each partition emits partial
    sums; combine is addition), unlike the two-pass mean-centered
    textbook formula. This is the profiling primitive behind
    distribution-drift monitors on 100 TB fact tables.

    Float discipline: power sums accumulate EXACTLY — integer cents
    widened to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both lossless
    for Σc⁴ at this scale — then the skew/kurt combination collapses in
    one deterministic double expression written token-identically in
    the oracle (sqrt, not pow(·,1.5): IEEE sqrt is correctly rounded
    on both engines, libm pow is not).

    Scale shape: one partial+final hash aggregate keyed by event_type;
    the moment algebra runs on one row per group."""
    d38 = "decimal(38,0)"
    cents = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("xc"),
    )
    xd = F.col("xc").cast(d38)
    comp = cents.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("s1"),
        F.sum(xd * F.col("xc")).alias("s2"),
        F.sum(xd * F.col("xc") * F.col("xc")).alias("s3"),
        F.sum(xd * F.col("xc") * F.col("xc") * F.col("xc")).alias("s4"),
    )
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    var = r2 - m * m
    m3 = r3 - 3 * m * r2 + 2 * m * m * m
    m4 = r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
    return comp.filter(F.col("n") >= 3).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.floor(F.col("s1").cast("double") / n * 100)
        .cast("bigint")
        .alias("mean_x100"),
        F.floor(m3 / (var * F.sqrt(var)) * 1000000)
        .cast("bigint")
        .alias("skew_ppm"),
        F.floor((m4 / (var * var) - 3) * 1000000)
        .cast("bigint")
        .alias("kurt_ppm"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
             AS total_price_c
    FROM orders
    GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: floor-bucketed numeric
    binning + exact DECIMAL mass per bin — the profiling primitive
    behind equi-width distribution sketches.

    One partial+final hash aggregate on a derived key; the floor
    division by a constant is deterministic on IEEE doubles (division
    is correctly rounded), so bucket ids — and the exact integer-cent
    mass per bucket — are engine-independent.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
            .cast("bigint")
            .alias("total_price_c"),
        )
    )


@query(
    "q_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT event_type, user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events
    ),
    p AS (
      SELECT DISTINCT a.event_type, a.user_id AS ua, b.user_id AS ub
      FROM iv a JOIN iv b
        ON a.event_type = b.event_type AND a.user_id < b.user_id
       AND a.s < b.e AND b.s < a.e
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY event_type
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (SURVEY §2.3 J9 as its own query): pairs
    of users whose 30-minute presence intervals overlap within an
    event type — co-presence analytics (fraud rings, session collision
    detection).

    The oracle is the quadratic self-join; the Spark side is the
    SCALABLE form: each interval explodes to the time buckets it
    spans (≤2 for 30-min intervals on a 30-min grid), the self-join
    keys on (type, bucket) — overlapping intervals MUST share a
    bucket, so the join never compares rows further apart than one
    bucket width — and the exact strict-overlap predicate plus a
    pair-distinct finish it. Join fan-out is bounded by per-bucket
    occupancy, not the corpus; a skewed bucket is a real hotspot in
    the data, not an artifact of the plan.

    merge hints on BOTH self-join inputs (the winnow/minhash
    estimate-trap class, round 10): the planner sizes the join sides
    from the pruned pre-explode SCAN estimate — explode does not
    inflate size estimates — so at sf10 a 20 M-row exploded side
    still "fits" the 64 MB broadcast threshold and the
    BroadcastExchange dies in awaitResult after minutes
    (SWEEP_r10_sf10 first run). Sort-merge keys on
    (event_type, bucket) and streams; the hint only matters where
    the estimate lies, and AQE still localizes small shuffles."""
    width_us = 30 * 60 * 1_000_000
    iv = table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + width_us).alias("e_us"),
    )
    bkts = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {width_us}"),
                F.expr(f"(e_us - 1) div {width_us}"),
            )
        ),
    )
    a = bkts.hint("merge").alias("a")
    b = bkts.hint("merge").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") < F.col("b.e_us"))
            & (F.col("b.s_us") < F.col("a.e_us")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
        )
        .distinct()
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


@query(
    "q_gini",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS DECIMAL(19,0)) AS sc,
             SUM((CAST(rnk AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))) AS src
      FROM v GROUP BY event_type
    )
    SELECT event_type, n, CAST(sc AS BIGINT) AS total_cents,
           CAST((num - num % den) / den AS BIGINT) AS gini_bp
    FROM (
      SELECT event_type, n, sc,
             CAST((2 * src - (CAST(n + 1 AS DECIMAL(10,0)) * CAST(sc AS DECIMAL(19,0))))
                  * 10000 AS DECIMAL(38,0)) AS num,
             (CAST(n AS DECIMAL(10,0)) * CAST(sc AS DECIMAL(19,0))) AS den
      FROM s
    ) t
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of event value per type (how
    unequal the spend distribution is), via the rank formula
    G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over values sorted ascending.

    Exactness: values are cent-scaled to BIGINT before any sum, ranks
    come from one per-type window with a total (value, event_id)
    order, and the final coefficient is a single integer division —
    no float anywhere, so the result is bit-identical across engines
    and partitionings. One keyed window + one keyed aggregate on the
    same key: a single exchange.

    Overflow headroom: Σrnk·c grows ~quadratically with rows per type
    (rank itself grows), and the ·10000 numerator blows int64 around
    sf10 (the sf1 sweep passed with only ~1.5x headroom). The rank
    product and the final combination run in decimal(38,0)
    (oracle: HUGEINT) — exact to ~1e38, i.e. through sf1e6."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    v = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
        F.row_number().over(w).alias("rnk"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("total_cents"),
        F.expr(
            "(2 * sum(cast(rnk as decimal(19,0)) * c)"
            " - (count(*) + 1) * cast(sum(c) as decimal(38,0))) * 10000"
            " div (count(*) * cast(sum(c) as decimal(38,0)))"
        ).cast("bigint").alias("gini_bp"),
    )


@query(
    "q_cusum",
    oracle="""
    WITH v AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t
      FROM events
    ),
    s AS (
      SELECT user_id, t,
             SUM(v_c) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(v_c) OVER (PARTITION BY user_id) AS total,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM v
    ),
    d AS (
      SELECT user_id, t, n, abs(n*cum - t*total) AS dev FROM s
    ),
    m AS (SELECT user_id, MAX(dev) AS max_dev FROM d GROUP BY user_id)
    SELECT d.user_id, CAST(MAX(d.n) AS BIGINT) AS n_events,
           CAST(m.max_dev AS BIGINT) AS max_dev,
           CAST(MIN(d.t) AS BIGINT) AS cp_t
    FROM d JOIN m ON d.user_id = m.user_id AND d.dev = m.max_dev
    GROUP BY d.user_id, m.max_dev
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point locator per key: the index t maximizing
    |cumsum_t - t*mean| flags the most likely mean shift in the
    series. Cleared of the division — the deviation is scaled by n
    (|n*cum_t - t*total|), so the whole statistic is exact BIGINT
    algebra and the argmax tie-break (smallest t) is deterministic.

    Plan: one keyed window pass (prefix sum + totals share the
    (user) exchange), one keyed max, one keyed self-join on the max
    value — per-key-bounded everywhere."""
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("user_id")
    v = table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("v_c"),
        F.row_number().over(w_ord).alias("t"),
    )
    s = v.select(
        "user_id",
        "t",
        F.sum("v_c").over(w_cum).alias("cum"),
        F.sum("v_c").over(w_all).alias("total"),
        F.count("*").over(w_all).alias("n"),
    )
    d = s.select(
        "user_id",
        "t",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("t") * F.col("total")).alias(
            "dev"
        ),
    )
    m = d.groupBy("user_id").agg(F.max("dev").alias("max_dev"))
    return (
        d.join(m, (d.user_id == m.user_id) & (d.dev == m.max_dev))
        .drop(m.user_id)
        .groupBy("user_id", "max_dev")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.min("t").cast("bigint").alias("cp_t"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("max_dev").cast("bigint").alias("max_dev"),
            "cp_t",
        )
    )


@query(
    "q_quantile_sketch",
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM orders
    ),
    h AS (
      SELECT CAST(FLOOR(SQRT(v_c)) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY bucket
    ),
    c AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS n
      FROM h
    ),
    p AS (SELECT pct FROM (VALUES (50), (90), (99)) AS v(pct))
    SELECT pct, MIN(bucket) AS bucket,
           MIN(bucket*bucket) AS lo_c,
           MIN((bucket+1)*(bucket+1) - 1) AS hi_c
    FROM p JOIN c ON c.cum*100 >= c.n*pct
    GROUP BY pct
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: a sqrt-scaled histogram (bucket =
    floor(sqrt(cents)) — IEEE-754 sqrt is correctly rounded, so the
    bucketing is bit-identical across engines) whose counts vector is
    the sketch state — merging partitions, days, or clusters is a
    keyed count-sum, the property approx_percentile's internal
    KLL-style sketch has but with a deterministic, oracle-checkable
    answer. Relative bucket width ~2/sqrt(v): <=1% relative error for
    values above 40k cents, tested against the exact percentile in
    tests/test_ml.py.

    Query side: the smallest bucket whose running mass reaches p%
    (cross-multiplied, no division) — the running mass runs through
    operators/ranking.global_running_sum over the BUCKET table
    (bounded cardinality: sqrt(max_cents) buckets), never the rows."""
    from ..operators.ranking import global_running_sum

    v = table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast(DEC) * 100).cast("bigint").alias("v_c")
    )
    h = v.groupBy(
        F.floor(F.sqrt("v_c")).cast("bigint").alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    c = global_running_sum(h, [F.col("bucket").asc()], "cnt", "cum")
    t = h.agg(F.sum("cnt").cast("bigint").alias("n"))
    pcts = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("pct")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .join(F.broadcast(pcts), F.col("cum") * 100 >= F.col("n") * F.col("pct"))
        .groupBy("pct")
        .agg(
            F.min("bucket").alias("bucket"),
            F.min(F.col("bucket") * F.col("bucket")).alias("lo_c"),
            F.min((F.col("bucket") + 1) * (F.col("bucket") + 1) - 1).alias(
                "hi_c"
            ),
        )
    )


@query(
    "q_benford",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4))*100
                              AS BIGINT) AS STRING), 1, 1) AS digit
      FROM orders
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST((COUNT(*) * 10000 - (COUNT(*) * 10000) % n) / n
                AS BIGINT) AS share_bp
    FROM d, t GROUP BY digit, n
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit profile of order totals — the
    classic fraud/integrity screen (synthetic data won't follow
    Benford's law; that deviation is exactly what the audit shows).
    The leading digit comes from the DECIMAL-exact cent integer's
    string form — no log10, no float, engine-portable.

    Plan: narrow map -> 9-key aggregate + broadcast 1-row total."""
    d = table(spark, sf_dir, "orders").select(
        F.substring(
            (F.col("o_totalprice").cast(DEC) * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        ).alias("digit")
    )
    t = d.agg(F.count("*").cast("bigint").alias("n"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_values"))
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_values",
            F.expr("n_values * 10000 div n").cast("bigint").alias("share_bp"),
        )
    )


@query(
    "q_feature_covariance",
    # dual-dialect (round 8): HUGEINT intermediates re-expressed
    # as width-disciplined DECIMAL products (dual_sql.dprod
    # rationale: operand widths sum <= 38 for DuckDB, Spark caps
    # at DECIMAL(38,0) exactly); verified value-identical to the
    # HUGEINT original at sf0.1 and sf1
    oracle="""
    WITH c AS (
      SELECT CAST(CAST(l_quantity      AS DECIMAL(18,4))*100 AS BIGINT) AS q,
             CAST(CAST(l_extendedprice AS DECIMAL(18,4))*100 AS BIGINT) AS e,
             CAST(CAST(l_discount      AS DECIMAL(18,4))*100 AS BIGINT) AS d,
             CAST(CAST(l_tax           AS DECIMAL(18,4))*100 AS BIGINT) AS t
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS sq, SUM(e) AS se, SUM(d) AS sd, SUM(t) AS st,
             SUM((CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))) AS sqq,
             SUM((CAST(q AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0)))) AS sqe,
             SUM((CAST(q AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))) AS sqd,
             SUM((CAST(q AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))) AS sqt,
             SUM((CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0)))) AS see,
             SUM((CAST(e AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))) AS sed,
             SUM((CAST(e AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))) AS set_,
             SUM((CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))) AS sdd,
             SUM((CAST(d AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))) AS sdt,
             SUM((CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))) AS stt
      FROM c
    )
    SELECT feat_x, feat_y, CAST(n AS BIGINT) AS n,
           CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             AS cov_c2
    FROM (
      SELECT 'quantity' AS feat_x, 'quantity' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sqq AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'quantity' AS feat_x, 'extendedprice' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sqe AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sq AS DECIMAL(19,0)) * CAST(se AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'quantity' AS feat_x, 'discount' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sqd AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sq AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'quantity' AS feat_x, 'tax' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sqt AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sq AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'extendedprice' AS feat_x, 'extendedprice' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(see AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(se AS DECIMAL(19,0)) * CAST(se AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'extendedprice' AS feat_x, 'discount' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sed AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(se AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'extendedprice' AS feat_x, 'tax' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(set_ AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(se AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'discount' AS feat_x, 'discount' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sdd AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sd AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'discount' AS feat_x, 'tax' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(sdt AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(sd AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0)))) AS num FROM s
  UNION ALL SELECT 'tax' AS feat_x, 'tax' AS feat_y, n,
         ((CAST(n AS DECIMAL(10,0)) * CAST(CAST(stt AS DECIMAL(28,0)) AS DECIMAL(28,0))) - (CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0)))) AS num FROM s
    ) u
    """,
)
def q_feature_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance matrix of the four lineitem numeric features
    (quantity, extendedprice, discount, tax, all in cents), in long
    form — the feature-correlation profile a training pipeline
    computes before fitting anything on tabular features.

    ONE scan, ONE map-side-combined hash aggregate producing all 15
    power sums (count, 4 sums, 10 pair products); the result is a
    single row exploded driver-free into the 10 (feat_x, feat_y)
    cells. Product sums widen to DECIMAL(38,0) before multiplying
    (HUGEINT in the oracle) — cents products reach 1e14 per row, so
    int64 would overflow around sf1 (the q_rolling_corr lesson); the
    covariance numerator n*Sxy - Sx*Sy stays exact until the ONE
    double division, written token-identically in both engines. The
    aggregate state is 15 numbers regardless of corpus size: the
    cheapest possible 100 TB shape."""
    li = table(spark, sf_dir, "lineitem")
    cents = lambda col: (  # noqa: E731
        (F.col(col).cast(DEC) * 100).cast("bigint")
    )
    c = li.select(
        cents("l_quantity").alias("q"),
        cents("l_extendedprice").alias("e"),
        cents("l_discount").alias("d"),
        cents("l_tax").alias("t"),
    )
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    feats = ("q", "e", "d", "t")
    names = {
        "q": "quantity",
        "e": "extendedprice",
        "d": "discount",
        "t": "tax",
    }
    aggs = [F.count("*").cast("decimal(38,0)").alias("n")]
    aggs += [F.sum(x).alias(f"s{x}") for x in feats]
    pairs = [
        (x, y) for i, x in enumerate(feats) for y in feats[i:]  # x <= y
    ]
    aggs += [F.sum(d19(x) * d19(y)).alias(f"s{x}{y}") for x, y in pairs]
    s = c.agg(*aggs)
    d38 = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    # ONE row with all 10 covariances, then stack() to long form — a
    # 10-way union of per-cell selects would re-run the corpus
    # aggregate once per branch; stack explodes the single computed row
    wide = s.select(
        F.col("n").cast("bigint").alias("n"),
        *[
            (
                (F.col("n") * F.col(f"s{x}{y}") - d38(f"s{x}") * d38(f"s{y}"))
                .cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double"))
            ).alias(f"cov_{x}{y}")
            for x, y in pairs
        ],
    )
    stack_args = ", ".join(
        f"'{names[x]}', '{names[y]}', cov_{x}{y}" for x, y in pairs
    )
    return wide.select(
        "n",
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (feat_x, feat_y, cov_c2)"
        ),
    ).select("feat_x", "feat_y", "n", "cov_c2")
