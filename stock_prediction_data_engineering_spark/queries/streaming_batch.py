"""Event-time window aggregation, batch mode (SURVEY.md §2.12 T1).

The reference's roadmap item "daily stock data updates"
(reference README.md:10,49) maps to Structured Streaming; the same
windowing expressions run identically in batch, which is what the
DuckDB oracle can check. The streaming forms (sliding / session /
watermark / stateful dedup) live in streaming/ and are exercised as
smoke tests (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..functions.exact import dsum
from ..registry import query


@query(
    "q_tumbling_window",
    # dual dialect (round-8): CAST(timestamp AS STRING) renders
    # identically in DuckDB and Spark (pinned in functions/dual_sql.py),
    # replacing the DuckDB-only strftime
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS STRING) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate over event time (T1). The
    window start is emitted as a formatted string so both engines hash
    the same value after µs truncation."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@query(
    "q_sliding_window",
    # dual dialect (round-8): DuckDB floor(epoch()) becomes the
    # explicit-extract epoch (functions/dual_sql.py — truncation IS the
    # floor for post-epoch data), and the LATERAL generate_series
    # expansion becomes a UNION ALL constant table (cross join), the
    # common spelling of a 4-row literal relation
    oracle=f"""
    SELECT ws * 1000000 AS win_start_us, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM (
      SELECT e.event_type, e.value,
             ({D.epoch_s('e.ts')}
              - {D.epoch_s('e.ts')} % 900 - u.k * 900) AS ws
      FROM events e CROSS JOIN (
        SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
      ) u
    )
    GROUP BY ws, event_type
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (T2) — each event lands
    in exactly width/slide = 4 windows; the same expression runs under
    readStream. Oracle: explicit window expansion (epoch floored to
    the slide, minus k slides for k in 0..3 — no filter needed because
    the width is an exact multiple of the slide), which is the
    relational definition of Spark's F.window(width, slide)."""
    from ..streaming.windows import sliding_agg

    ev = table(spark, sf_dir, "events")
    return sliding_agg(ev).select(
        F.unix_micros("win_start").alias("win_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q_session_window",
    # dual dialect (round-8): epoch_us() becomes the explicit-extract
    # + string-fraction form (functions/dual_sql.py); the interval
    # comparison and arithmetic were already common. The per-session
    # bounds aggregate in an inner CTE so the macro applies to plain
    # columns, not repeated aggregate expressions.
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    bounds AS (
        SELECT user_id, sid,
               MIN(ts) AS t0,
               MAX(ts) + INTERVAL 30 MINUTE AS t1,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, sid
    )
    SELECT {D.epoch_us('t0')} AS session_start_us,
           {D.epoch_us('t1')} AS session_end_us,
           user_id, n_events, sum_value
    FROM bounds
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap (T3). Oracle:
    gaps-and-islands (new-session flag + running sum = session id) —
    the relational definition of Spark's session_window, whose end is
    last event + gap. Same-timestamp ties are gap-0 and therefore
    always co-session, so the labeling is deterministic."""
    from ..streaming.windows import session_agg

    ev = table(spark, sf_dir, "events")
    return session_agg(ev).select(
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "user_id",
        "n_events",
        "sum_value",
    )
