"""Event-stream analytics composites over the ``events`` table:
funnel conversion, SCD2 validity intervals, cohort retention.

The reference's roadmap ends at "daily stock data updates"
(reference README.md:10,49); a production event lake adds these three
classic analyses on top of the same table. All three are expressed as
keyed shuffles and per-key windows — no global window, no driver-side
loop — so each plan survives a 100x scale-up: the funnel is three
min-aggregates chained by user_id equi-joins (AQE-skew-eligible), the
SCD2 pass is one per-key window, and retention is two hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query


@query(
    "q_funnel_conversion",
    # dual dialect (round-8): DuckDB epoch_us() -> the explicit-extract
    # + string-fraction form (functions/dual_sql.py)
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           {D.epoch_us('s1.t_view')} AS t_view_us,
           COALESCE({D.epoch_us('s2.t_click')}, -1) AS t_click_us,
           COALESCE({D.epoch_us('s3.t_purchase')}, -1) AS t_purchase_us,
           1 + CAST(s2.user_id IS NOT NULL AS INT)
             + CAST(s3.user_id IS NOT NULL AS INT) AS funnel_depth
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase per user: each stage's
    first event must be strictly after the previous stage's.

    Three conditional min-aggregates chained by user_id equi-joins —
    every shuffle is keyed on user_id and each stage's output is at
    most one row per user, so stage N's join input shrinks
    monotonically. Unreached stages carry a -1 sentinel (not NULL) so
    the cross-engine value hash is exact.
    """
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t_view").alias("t_view_us"),
            F.coalesce(F.unix_micros("t_click"), F.lit(-1)).alias("t_click_us"),
            F.coalesce(F.unix_micros("t_purchase"), F.lit(-1)).alias("t_purchase_us"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("funnel_depth"),
        )
    )


@query(
    "q_scd2_intervals",
    # dual dialect (round-8): LEAD computed once in a CTE so the
    # epoch_us macro (functions/dual_sql.py) applies to a plain column
    oracle=f"""
    WITH w AS (
      SELECT user_id, ts, value,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT user_id,
           {D.epoch_us('ts')} AS valid_from_us,
           COALESCE({D.epoch_us('next_ts')}, -1) AS valid_to_us,
           next_ts IS NULL AS is_current,
           value
    FROM w
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each per-user attribute update becomes
    a validity interval [valid_from, valid_to), open-ended on the
    latest row. This is the standard lakehouse dimension-history
    derivation (change feed -> interval table, joinable as-of any
    point in time).

    One window partitioned by user_id with a unique (ts, event_id)
    ordering — per-key state only, no global sort. The open end uses a
    -1 sentinel instead of NULL for exact cross-engine hashing.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.unix_micros("ts").alias("valid_from_us"),
        F.coalesce(F.unix_micros(nxt), F.lit(-1)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "value",
    )


@query(
    "q_retention_cohorts",
    # dual dialect (round-8): strftime -> CAST(date AS STRING) (same
    # rendering both engines); date_diff('day',..) -> the interval-day
    # extract (functions/dual_sql.py). The /7 stays exact: both weeks
    # are Monday-truncated, so the day span is always a multiple of 7.
    oracle=f"""
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events
    )
    SELECT CAST(c.cohort_week AS STRING) AS cohort_week,
           CAST({D.days_between('c.cohort_week', 'a.act_week')} / 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_active
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    GROUP BY c.cohort_week, week_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted in each later activity week (offset in weeks).

    Two hash aggregates (cohort assignment, distinct activity weeks)
    and one user_id equi-join — the join carries one row per user per
    active week, already distinct, so the final aggregate's input is
    bounded by |users| x |weeks|, not by raw event count.
    """
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "q_concurrent_events",
    oracle="""
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS d FROM events
    ),
    c AS (
      SELECT event_type,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cur
      FROM pts
    )
    SELECT event_type, CAST(MAX(cur) AS BIGINT) AS max_concurrent
    FROM c GROUP BY event_type
    """,
)
def q_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type via the distributed sweep-line:
    each event opens a 30-minute presence interval; interval starts
    become +1 deltas and ends -1 deltas, a per-key cumulative sum walks
    the timeline, and the max prefix sum is the peak number of
    simultaneously-open intervals — the "max concurrent sessions"
    primitive behind capacity monitors.

    Determinism: ends sort before starts at the same instant (d = -1
    first ⇒ intervals are end-exclusive), and rows with identical
    (t, d) are interchangeable — any order yields the same multiset of
    prefix sums, so MAX is engine-independent.

    Scale shape: union ≈ 2x scan, then ONE window exchange keyed by
    event_type and a keyed max that reuses its partitioning. No global
    ordering; at 100 TB each event type's timeline walks in parallel.
    """
    ev = table(spark, sf_dir, "events")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t"),
        F.lit(-1).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cur = starts.unionByName(ends).select(
        "event_type", F.sum("d").over(w).alias("cur")
    )
    return cur.groupBy("event_type").agg(
        F.max("cur").cast("bigint").alias("max_concurrent")
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(((n * 10000) - (n * 10000)
                              % SUM(n) OVER (PARTITION BY prev_type))
                / SUM(n) OVER (PARTITION BY prev_type)
                AS BIGINT) AS prob_bp
    FROM t
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each observed (prev_type -> next_type) bigram of consecutive
    events per user, its count and row-normalized transition
    probability in basis points (exact integer division — no float in
    the hot path, same idiom as q_heavy_keys).

    Scale shape: ONE per-user window (lag) over the raw stream, then a
    keyed count whose output is event_type² rows — tiny at any corpus
    size — so the normalizing window over prev_type runs on a
    vocabulary-sized table. The raw-data stages are a single user_id
    exchange; nothing downstream grows with the corpus."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    t = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    return t.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(n * 10000) div sum(n) over (partition by prev_type)")
        .cast("bigint")
        .alias("prob_bp"),
    )


@query(
    "q_running_distinct",
    oracle="""
    WITH fs AS (
      SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id, event_type
    ),
    d AS (
      SELECT user_id, first_day, CAST(COUNT(*) AS BIGINT) AS new_types
      FROM fs GROUP BY user_id, first_day
    )
    SELECT user_id, first_day, new_types,
           CAST(SUM(new_types) OVER (PARTITION BY user_id
                                     ORDER BY first_day) AS BIGINT)
             AS cum_types
    FROM d
    """,
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct count over time (the "vocabulary growth"
    curve): per user and day, how many NEW event types first appeared
    that day and how many distinct types have been seen so far.

    The naive form — COUNT(DISTINCT) over an expanding window —
    rescans the full history per row and holds per-window distinct
    state; this rewrite is the scalable identity: distinct-so-far =
    running sum of first-occurrences. Two keyed aggregates and a
    per-key cumulative window, all hashed on user_id (one exchange);
    state per group is a single counter, independent of history
    length."""
    e = table(spark, sf_dir, "events")
    fs = (
        e.groupBy("user_id", "event_type")
        .agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    )
    d = fs.groupBy("user_id", "first_day").agg(
        F.count("*").alias("new_types")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "user_id",
        "first_day",
        "new_types",
        F.sum("new_types").over(w).cast("bigint").alias("cum_types"),
    )


@query(
    "q_cdc_merge",
    oracle="""
    WITH ch AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'delete'
                  ELSE 'upsert' END AS op,
             CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS balance,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    latest AS (SELECT user_id, op, balance FROM ch WHERE rn = 1),
    base AS (
      SELECT c_custkey AS cust_key,
             CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS balance
      FROM customer
    )
    SELECT b.cust_key, b.balance, 'base' AS src
    FROM base b LEFT JOIN latest l ON b.cust_key = l.user_id
    WHERE l.user_id IS NULL
    UNION ALL
    SELECT l.user_id AS cust_key, l.balance, 'cdc' AS src
    FROM latest l WHERE l.op <> 'delete'
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics as a batch query (operators/cdc.py): the
    events stream is read as a changelog over the customer dimension —
    per user, the LATEST event wins; an 'error' event deletes the row,
    anything else upserts the event's value as the new balance;
    untouched customers pass through. This is the reference's "daily
    stock data updates" roadmap row (reference README.md:10,49) made
    exact: order-independent across partitions because the changelog
    collapse is a total-order window, not feed order.

    Plan: one per-key window on the changelog (batch-sized), one
    left-anti join on the merge key, one union — the merge never
    scans more than base + batch."""
    from ..operators.cdc import apply_changes

    base = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_acctbal").cast("decimal(18,4)").cast("double").alias("balance"),
        F.lit("base").alias("src"),
    )
    changes = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("cust_key"),
        F.col("value").cast("decimal(18,4)").cast("double").alias("balance"),
        F.lit("cdc").alias("src"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        "ts",
        "event_id",
    )
    return apply_changes(
        base,
        changes,
        key_cols=["cust_key"],
        seq_cols=["ts", "event_id"],
    )


@query(
    "q_sessionize",
    # dual dialect (round-8): date_diff('second',a,b) == the truncated
    # epoch difference (boundary counting), expressed via the
    # explicit-extract epoch (functions/dual_sql.py); the lag rides a
    # CTE column so the macro never wraps a window expression, and the
    # named WINDOW clause is inlined (Spark-parseable)
    oracle=f"""
    WITH l AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR {D.epoch_s('ts')} - {D.epoch_s('prev_ts')} > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM l
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g
    ),
    b AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(ts) AS t0, MAX(ts) AS t1
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events,
           CAST({D.epoch_s('t1')} - {D.epoch_s('t0')} AS BIGINT)
             AS duration_s
    FROM b
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit gap-based sessionization (gaps-and-islands): a session
    id is the running count of >30-minute gaps, so every event gets a
    stable (user, session) label — the MATERIALIZED form of T3's
    session_window aggregate (q_session_window), which only emits the
    window bounds. Per-session row counts and wall durations follow
    from one keyed aggregate.

    Plan: two stacked keyed windows (lag, running sum) on ONE
    (user, time) sort, then a keyed aggregate — per-key-bounded."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 1800),
        1,
    ).otherwise(0)
    s = ev.withColumn("new_s", new_s).withColumn(
        "session_id", F.sum("new_s").over(w_cum)
    )
    return s.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("duration_s"),
    )


@query(
    "q_rolling_active_users",
    # dual-dialect: the 7-day coverage explode as a numbers cross join
    # + interval multiply (generate_series has no Spark spelling)
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cover AS (
      SELECT user_id,
             CAST(day + (n.i - 1) * INTERVAL 1 DAY AS DATE) AS day
      FROM ud CROSS JOIN {D.nums_rel(7)} n
    ),
    span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud)
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM cover, span
    WHERE day BETWEEN lo AND hi
    GROUP BY day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day. Spark windows cannot
    do COUNT(DISTINCT) over a frame; the distributed form inverts the
    problem — each (user, active-day) pair CONTRIBUTES to the 7
    subsequent days' windows, so WAU(d) = distinct users among
    contributions landing on d. One distinct collapse, a 7-row
    explode, one keyed distinct-count — no per-day state, no
    re-scanning a growing frame.

    Output clipped to the observed day span so edge days (windows
    reaching past the data) are not reported."""
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    span = ud.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        cover.crossJoin(F.broadcast(span))
        .filter(F.col("day").between(F.col("lo"), F.col("hi")))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )


@query(
    "q_event_paths",
    oracle="""
    WITH s AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path
    ORDER BY cnt DESC, path
    LIMIT 20
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 20 most common 3-step event-type
    sequences across all users (every consecutive triple in each
    user's timeline) — the n-gram view of a clickstream that funnels
    and transition matrices both summarize away.

    Scale shape: one per-user window exchange produces both leads in a
    single pass, then a hash aggregate over a path vocabulary bounded
    by |event_type|^3 (tiny), finished by TakeOrderedAndProject — the
    full path table never sorts globally. The window ordering
    (ts, event_id) is total, so ties cannot reorder across engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "path")
        .limit(20)
    )


@query(
    "q_inter_event_gaps",
    # dual dialect (round-8): epoch_us() via functions/dual_sql.py
    # (lag in a CTE so the macro wraps plain columns); the `//` average
    # uses the DECIMAL(38,0) exact form — SUM(gap_us) can pass 2^53
    # (µs spans summed over thousands of users), the precision cliff
    # the registry's plain rewrite documents
    oracle=f"""
    WITH l AS (
      SELECT event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    g AS (
      SELECT event_type,
             {D.epoch_us('ts')} - {D.epoch_us('prev_ts')} AS gap_us
      FROM l
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           {D.intdiv_exact('SUM(gap_us)', 'COUNT(*)')} AS avg_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile: per event type, the count, total, max,
    and integer mean of the microsecond gaps between consecutive
    events of the same user — the cadence statistic that sizes
    sessionization thresholds and watermark delays (q_sessionize's
    30-minute gap and the streaming watermark both come from this
    distribution's tail).

    Scale shape: one window exchange keyed (user_id, event_type), then
    a tiny per-type hash aggregate with map-side partials. Gaps are
    exact integer microsecond differences (unix_micros ≡ epoch_us), so
    the cross-engine hash needs no float tolerance."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts", 1).over(w))).alias(
            "gap_us"
        ),
    )
    return (
        g.filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.expr("sum(gap_us) div count(*)").alias("avg_gap_us"),
        )
    )


@query(
    "q_dedup_consecutive",
    # dual dialect (round-8): epoch_us() via functions/dual_sql.py
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT event_id, user_id, event_type, {D.epoch_us('ts')} AS ts_us
    FROM s
    WHERE prev_type IS NULL OR event_type <> prev_type
    """,
)
def q_dedup_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate suppression (run-length dedup): keep an
    event only when its type differs from the user's immediately
    preceding event — the debounce/compaction pass that collapses
    button-mash and sensor-repeat runs before sessionization. Distinct
    from exact dedup (L1): the SAME type recurring later in the stream
    is kept; only adjacent repeats drop.

    Scale shape: one per-user window exchange with a single lag — the
    same exchange sessionization uses, so the two compose without a
    second shuffle. The (ts, event_id) ordering is total; ties cannot
    flip keep/drop decisions across engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return s.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    ).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


@query(
    "q_user_lifetime",
    # dual dialect (round-8): date_diff('day',..) via the interval-day
    # extract (functions/dual_sql.py)
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    g AS (SELECT MAX(ts) AS now_ts FROM events)
    SELECT user_id, n_events,
           {D.days_between('CAST(first_ts AS DATE)', 'CAST(last_ts AS DATE)')}
             AS lifetime_days,
           ({D.days_between('CAST(last_ts AS DATE)', 'CAST(now_ts AS DATE)')} > 30)
             AS churned
    FROM u, g
    """,
)
def q_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifetime and churn flag: per user, the event count, the
    day span between first and last activity, and whether the user is
    churned (last activity more than 30 days before the corpus's
    latest event — the observation horizon, so the flag is
    reproducible from the data alone, no wall clock).

    Scale shape: one keyed aggregate with map-side partials plus a
    1-row global max broadcast back onto it — the per-key output is
    user-sized and every downstream LTV/segmentation join starts
    broadcast-eligible."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
    )
    g = ev.agg(F.max("ts").alias("now_ts"))
    return u.crossJoin(F.broadcast(g)).select(
        "user_id",
        "n_events",
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
        .cast("bigint")
        .alias("lifetime_days"),
        (F.datediff(F.to_date("now_ts"), F.to_date("last_ts")) > 30).alias(
            "churned"
        ),
    )


@query(
    "q_linear_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT p.event_id, p.v_c, t.event_type,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
    ),
    credit AS (
      SELECT event_type AS channel,
             (v_c * 1000000 - (v_c * 1000000) % n) / n AS cu FROM j
    ),
    direct AS (
      SELECT 'direct' AS channel, v_c * 1000000 AS cu FROM p
      WHERE event_id NOT IN (SELECT event_id FROM j)
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(cu) AS BIGINT) AS credited_uc
    FROM (SELECT * FROM credit UNION ALL SELECT * FROM direct)
    GROUP BY channel
    """,
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the user's view/click touches in the 7 days before
    it; purchases with no preceding touch credit a 'direct' channel.
    The classic marketing-analytics allocation, reduced to a per-
    channel scorecard.

    Shape at scale: purchases join touches on user_id (keyed,
    AQE-skew-eligible; the time predicate rides the join), the
    per-purchase touch count is ONE window keyed by the purchase's
    event_id, and the no-touch remainder is a keyed left-anti join.
    Credits are exact integer micro-cents (v_c * 1e6 div n) — no
    float division anywhere, so the per-channel sums are bit-identical
    across engines."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.col("value").cast("decimal(18,4)") * 100)
        .cast("bigint")
        .alias("v_c"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    j = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).withColumn("n", F.count("*").over(Window.partitionBy("event_id")))
    credit = j.select(
        F.col("event_type").alias("channel"),
        F.expr("v_c * 1000000 div n").alias("cu"),
    )
    direct = p.join(
        j.select("event_id"), "event_id", "left_anti"
    ).select(
        F.lit("direct").alias("channel"),
        (F.col("v_c") * 1000000).alias("cu"),
    )
    return (
        credit.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            F.sum("cu").cast("bigint").alias("credited_uc"),
        )
    )


@query(
    "q_cohort_ltv",
    # dual dialect (round-8): date_diff('day',..)//7 via the
    # interval-day extract + registry `//` rewrite (non-negative:
    # purchases are at/after signup); VARCHAR -> STRING (both engines'
    # shared spelling)
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)
               AS cohort_week,
             MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, s.cohort_week,
             {D.intdiv(D.days_between('s.cohort_week', 'CAST(e.ts AS DATE)'), '7')}
               AS age_week,
             CAST(CAST(e.value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
    ),
    g AS (
      SELECT cohort_week, CAST(age_week AS BIGINT) AS age_week,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(v_c) AS BIGINT) AS revenue_c
      FROM p GROUP BY 1, 2
    )
    SELECT CAST(cohort_week AS STRING) AS cohort_week, age_week,
           n_purchases, revenue_c,
           CAST(SUM(revenue_c) OVER (PARTITION BY cohort_week
                ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS BIGINT) AS cum_revenue_c
    FROM g
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by signup week,
    purchase revenue accumulated by weeks-since-signup — the LTV
    triangle that complements q_retention_cohorts' retention rates
    with money.

    Shape at scale: one user-keyed signup collapse joins purchases on
    user_id (keyed, skew-eligible), then a (cohort, age) hash
    aggregate whose output is calendar-bounded (weeks x ages), so the
    cumulative window runs over a tiny table no matter the corpus.
    Revenue is exact integer cents end-to-end."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .select(
            "user_id",
            "signup_ts",
            F.date_trunc("week", F.col("signup_ts"))
            .cast("date")
            .alias("cohort_week"),
        )
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            "ts",
            (F.col("value").cast("decimal(18,4)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .join(
            s,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("ts") >= F.col("signup_ts")),
        )
        .select(
            "cohort_week",
            F.expr("datediff(CAST(ts AS DATE), cohort_week) div 7")
            .cast("bigint")
            .alias("age_week"),
            "v_c",
        )
    )
    g = p.groupBy("cohort_week", "age_week").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("v_c").cast("bigint").alias("revenue_c"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "age_week",
        "n_purchases",
        "revenue_c",
        F.sum("revenue_c").over(w).cast("bigint").alias("cum_revenue_c"),
    )


@query(
    "q_time_to_convert",
    # dual dialect (round-8): epoch_us() via functions/dual_sql.py; the
    # `//` chain uses the registry rewrite (non-negative latencies,
    # per-user gaps ≪ 2^53 µs)
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    gap AS (
      SELECT {D.epoch_us('p.t_purchase')} - {D.epoch_us('v.t_view')} AS g_us
      FROM p JOIN v USING (user_id)
    ),
    lat AS (
      SELECT CAST({D.intdiv(D.intdiv('g_us', '60000000'), '30')} AS BIGINT)
               AS bucket_30m
      FROM gap
    ),
    agg AS (
      SELECT bucket_30m, COUNT(*) AS n_users FROM lat GROUP BY bucket_30m
    ),
    tot AS (SELECT SUM(n_users) AS total FROM agg)
    SELECT CAST(bucket_30m AS BIGINT) AS bucket_30m,
           CAST(n_users AS BIGINT) AS n_users,
           CAST({D.intdiv('n_users * 10000', 'tot.total')} AS BIGINT) AS share_bp
    FROM agg CROSS JOIN tot
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: minutes from a user's FIRST view
    to their first subsequent purchase, bucketed at 30-minute grain
    with each bucket's share of converters in basis points — the
    "how long does conversion take" distribution that q_funnel_conversion
    (who converts) and q_inter_event_gaps (adjacent-event cadence)
    don't answer.

    Scale shape: two user-keyed conditional min-aggregates chained by
    a user_id equi-join (one row per user after stage 1, shrinking),
    then one bucket-keyed count whose key space is the latency range —
    the share window runs over BUCKETS, not users. Latency arithmetic
    is exact integer microseconds -> integer division, so buckets and
    shares are bit-identical across engines."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"), F.min("t_view").alias("t_view"))
    )
    lat = p.select(
        F.expr(
            "(unix_micros(t_purchase) - unix_micros(t_view))"
            " div 60000000 div 30"
        ).alias("bucket_30m")
    )
    agg = lat.groupBy("bucket_30m").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    # share of total via agg -> 1-row re-agg -> broadcast (the
    # q_ratio_to_report pattern) — never a partition-total window;
    # exact integer division keeps the hash engine-stable
    tot = agg.agg(F.sum("n_users").alias("total"))
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("bucket_30m").cast("bigint").alias("bucket_30m"),
        "n_users",
        F.expr("(n_users * 10000) div total").cast("bigint").alias("share_bp"),
    )
