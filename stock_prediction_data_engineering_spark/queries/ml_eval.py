"""Model-evaluation and experimentation analytics: exact rank-based
AUC, two-sample KS statistic, A/B lift, probability-proportional
sampling, and RFM segmentation.

No reference-repo counterpart (the reference is a 131-line ingest DAG,
reference dags/stock_data_airflow_local_aws_s3.py); this is the
evaluation/experimentation surface a training-data platform needs
next to its curation queries.

Float discipline: every statistic is emitted as an integer basis-point
(or doubled-rank) value derived by cross-multiplication — ranks,
counts, and cumulative masses are exact integers on both engines, so
the hash check is bit-stable. The single FLOOR(double) in q_ab_lift
is written token-identically in the oracle (signed division, where
Spark's `div` truncates but DuckDB's `//` floors — FLOOR of an exact
double quotient sidesteps the disagreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query

DEC = "decimal(18,4)"


@query(
    "q_auc_rank",
    oracle="""
    WITH d AS (
      SELECT lang, n_chars,
             CASE WHEN length(source) <= 4 THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    r AS (
      SELECT lang, pos,
             2*rank() OVER (PARTITION BY lang ORDER BY n_chars)
               + COUNT(*) OVER (PARTITION BY lang, n_chars) - 1
               AS midrank2
      FROM d
    ),
    s AS (
      SELECT lang,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
             CAST(SUM(CASE WHEN pos = 1 THEN midrank2 ELSE 0 END)
                  AS BIGINT) AS s2
      FROM r GROUP BY lang
    )
    SELECT lang, n_pos, n_neg,
           CAST(((s2 - n_pos*(n_pos+1)) * 10000
                 - ((s2 - n_pos*(n_pos+1)) * 10000) % (2*n_pos*n_neg))
                / (2*n_pos*n_neg) AS BIGINT) AS auc_bp
    FROM s
    """,
)
def q_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC by the rank-sum (Mann-Whitney U) identity, per
    language: how well document length separates single-digit sources
    from the rest. Ties get midranks — 2*midrank = 2*min_rank +
    tie_count - 1 stays integer, so AUC reduces to pure integer
    algebra: U = (sum of doubled positive midranks - n_pos(n_pos+1))/2
    and auc_bp = U*10000/(n_pos*n_neg), cross-multiplied.

    This is the distributed-safe AUC: no sorting of scores to the
    driver, no trapezoid sweep — two keyed windows and one keyed
    aggregate, grouping by the evaluation segment."""
    d = table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.when(F.length("source") <= 4, 1).otherwise(0).alias("pos"),
    )
    w_rank = Window.partitionBy("lang").orderBy("n_chars")
    w_tie = Window.partitionBy("lang", "n_chars")
    r = d.withColumn(
        "midrank2",
        2 * F.rank().over(w_rank) + F.count("*").over(w_tie) - 1,
    )
    s = r.groupBy("lang").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("pos") == 1, F.col("midrank2")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
    )
    return s.select(
        "lang",
        "n_pos",
        "n_neg",
        F.expr("(s2 - n_pos*(n_pos+1)) * 10000 div (2*n_pos*n_neg)")
        .cast("bigint")
        .alias("auc_bp"),
    )


@query(
    "q_ks_stat",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
      SELECT v_c,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM v GROUP BY v_c
    ),
    c AS (
      SELECT SUM(a) OVER (ORDER BY v_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(b) OVER (ORDER BY v_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM g
    ),
    t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM g)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST((MAX(abs(ca*nb - cb*na)) * 10000
                 - (MAX(abs(ca*nb - cb*na)) * 10000) % (na*nb))
                / (na*nb) AS BIGINT)
             AS ks_bp
    FROM c, t GROUP BY na, nb
    """,
)
def q_ks_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (click vs view value
    distributions): max |CDF_a - CDF_b|, cleared of divisions —
    |ca*nb - cb*na| over the common denominator na*nb, all integers.

    The global CDF needs a prefix sum over the full value order; that
    runs through operators/ranking.global_running_sum (range-partition
    + per-partition cumsum + broadcast offsets), NOT an un-partitioned
    window — the oracle's plain OVER (ORDER BY) is the test-scale
    shortcut, the Spark plan is the 100 TB form. The cumsum runs on
    the DISTINCT-value aggregate, so its input is value-cardinality-
    sized, not row-sized."""
    from ..operators.ranking import global_running_sum

    v = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            (F.col("value").cast(DEC) * 100).cast("bigint").alias("v_c"),
        )
    )
    g = v.groupBy("v_c").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    c = global_running_sum(g, [F.col("v_c").asc()], ["a", "b"], ["ca", "cb"])
    t = g.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(
            F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias(
                "__m"
            )
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.expr("__m * 10000 div (na*nb)").cast("bigint").alias("ks_bp"),
        )
    )


@query(
    "q_ab_lift",
    # dual-dialect: the arm bit is the parity of the 15-hex-digit md5
    # prefix = parity of its last digit (positional decode, dual_sql)
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             {D.hex_int("substring(md5(CAST(user_id AS STRING)), 15, 1)", 1)}
               % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM u GROUP BY arm
    )
    SELECT a0.n_users AS users_a, a0.n_conv AS conv_a,
           a1.n_users AS users_b, a1.n_conv AS conv_b,
           CAST(FLOOR(CAST(a1.n_conv*a0.n_users - a0.n_conv*a1.n_users
                           AS DOUBLE) * 10000
                      / (a0.n_conv*a1.n_users)) AS BIGINT) AS lift_bp
    FROM a a0 JOIN a a1 ON a0.arm = 0 AND a1.arm = 1
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are deterministically assigned an
    arm by content hash of their id (md5 — engine-portable, stable
    under re-ingestion, same property as q_train_split), conversion is
    any 'purchase' event, and the relative lift of arm B over arm A is
    emitted in basis points. The signed lift goes through FLOOR of an
    exact double quotient because Spark's integer `div` truncates
    toward zero while DuckDB's `//` floors — they disagree exactly on
    negative lifts.

    Plan: one keyed user collapse, one 2-key aggregate, one broadcast
    self-pair — no shuffle beyond the user collapse."""
    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(2),
            ).alias("arm"),
            "converted",
        )
    )
    a = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    a0 = a.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("users_a"), F.col("n_conv").alias("conv_a")
    )
    a1 = a.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("users_b"), F.col("n_conv").alias("conv_b")
    )
    return a0.crossJoin(F.broadcast(a1)).select(
        "users_a",
        "conv_a",
        "users_b",
        "conv_b",
        F.floor(
            (F.col("conv_b") * F.col("users_a") - F.col("conv_a") * F.col("users_b"))
            .cast("double")
            * 10000
            / (F.col("conv_a") * F.col("users_b"))
        )
        .cast("bigint")
        .alias("lift_bp"),
    )


@query(
    "q_pps_sample",
    oracle="""
    WITH c AS (
      SELECT source, doc_id, n_chars AS wt,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_after,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT source, doc_id, CAST(wt AS BIGINT) AS wt
    FROM c
    WHERE FLOOR((cum_after - wt)
                / GREATEST((total - total % 5) / 5, 1))
          < FLOOR(cum_after
                / GREATEST((total - total % 5) / 5, 1))
    """,
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling, per
    source: walk each source's cumulative token mass and take every
    document whose span crosses a stride boundary (stride = total/5,
    so ~5 docs per source, selection probability proportional to
    weight). Fully deterministic — no RNG, no reservoir — and exact
    integer arithmetic, so the sample is reproducible across engines
    and re-partitioning.

    This is the deterministic counterpart of weighted reservoir
    sampling (Efraimidis-Spirakis needs log/rand — not oracle-safe).
    Plan: two keyed windows over one shuffle by source."""
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("source")
    c = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").alias("wt"),
        F.sum("n_chars").over(w_cum).alias("cum_after"),
        F.sum("n_chars").over(w_tot).alias("total"),
    )
    return c.filter(
        F.expr(
            "(cum_after - wt) div greatest(total div 5, 1)"
            " < cum_after div greatest(total div 5, 1)"
        )
    ).select("source", "doc_id", F.col("wt").cast("bigint").alias("wt"))


@query(
    "q_rfm",
    oracle="""
    WITH f AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_o,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monet
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT o_custkey, monet,
             ntile(5) OVER (ORDER BY last_o, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monet, o_custkey) AS m_score
      FROM f
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monet)*100 AS BIGINT) AS monet_c
    FROM s GROUP BY r_score, f_score, m_score
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each ordering customer scored 1-5 on recency
    (last order date), frequency (order count), and monetary value
    (exact DECIMAL revenue), then rolled up to segment cells. Every
    quintile is an exact global NTILE through the distributed
    two-phase ranker (operators/ranking.py) — three range-partitioned
    sorts over a customer-sized aggregate, no single-partition
    windows, no interpolated percentiles to disagree on."""
    from ..operators.ranking import global_ntile

    f = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_o"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("monet"),
        )
    )
    s = global_ntile(
        f, 5, [F.col("last_o").asc(), F.col("o_custkey").asc()], "r_score"
    )
    s = global_ntile(
        s, 5, [F.col("freq").asc(), F.col("o_custkey").asc()], "f_score"
    )
    s = global_ntile(
        s, 5, [F.col("monet").asc(), F.col("o_custkey").asc()], "m_score"
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        (F.sum("monet") * 100).cast("bigint").alias("monet_c"),
    )


@query(
    "q_gains_table",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monet
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT ntile(10) OVER (ORDER BY monet DESC, o_custkey) AS decile,
             monet
      FROM f
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(monet)*100 AS BIGINT) AS monet_c
      FROM s GROUP BY decile
    ),
    c AS (
      SELECT decile, n_customers, monet_c,
             SUM(monet_c) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             SUM(monet_c) OVER () AS total_c
      FROM d
    )
    SELECT decile, n_customers, monet_c,
           CAST((cum_c * 10000 - (cum_c * 10000) % total_c)
                / total_c AS BIGINT) AS cum_share_bp
    FROM c
    """,
)
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains table (cumulative-lift / Lorenz view): customers ranked
    by revenue into deciles, with each decile's cumulative share of
    total revenue in basis points — the 'top 10% of customers carry
    X% of revenue' readout, and the evaluation twin of q_gini (which
    collapses this curve to one coefficient).

    Plan: customer-sized aggregate -> exact global decile via the
    two-phase ranker -> 10-row decile aggregate; the cumulative share
    over the 10-row table is a broadcast-trivial keyed window (the
    decile table is constant-sized, so a 1-group window here is
    bounded by construction, not by data)."""
    from ..operators.ranking import global_ntile, global_running_sum

    f = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("monet"))
    )
    s = global_ntile(
        f, 10, [F.col("monet").desc(), F.col("o_custkey").asc()], "decile"
    )
    d = s.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        (F.sum("monet") * 100).cast("bigint").alias("monet_c"),
    )
    c = global_running_sum(d, [F.col("decile").asc()], "monet_c", "cum_c")
    t = d.agg(F.sum("monet_c").cast("bigint").alias("total_c"))
    return c.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_customers",
        "monet_c",
        F.expr("cum_c * 10000 div total_c").cast("bigint").alias("cum_share_bp"),
    )


@query(
    "q_weekday_seasonality",
    # dual dialect (round-8): dayofweek numbering differs (DuckDB
    # Sunday=0..6, Spark Sunday=1..7), so dow derives from the engine-
    # neutral day count since a known SUNDAY (1970-01-04) mod 7 —
    # exactly DuckDB's 0=Sunday numbering, which the DataFrame side
    # already emits via dayofweek-1
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST({D.days_between("DATE '1970-01-04'", 'CAST(ts AS DATE)')} % 7
                  AS INTEGER) AS dow,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM events
    ),
    d AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_c) AS BIGINT) AS sum_c
      FROM e GROUP BY event_type, dow
    ),
    t AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(sum_c) AS BIGINT) AS sum_all
      FROM d GROUP BY event_type
    )
    SELECT d.event_type, dow, n,
           CAST((sum_c * n_all * 10000
                 - (sum_c * n_all * 10000) % (n * sum_all))
                / (n * sum_all) AS BIGINT)
             AS index_bp
    FROM d JOIN t USING (event_type)
    """,
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: the day's mean
    value relative to the type's overall mean, in basis points
    (10000 = no seasonality). The ratio of means is cleared to one
    integer floor division — (sum_d/n_d)/(sum_all/n_all) =
    sum_d*n_all/(n_d*sum_all) — so cross-engine exact. DuckDB's
    dayofweek is 0-6 Sunday-first; Spark's dayofweek is 1-7, so the
    Spark side emits dayofweek-1 to match.

    Plan: one (type, dow)-keyed aggregate (42 rows), one type-keyed
    rollup of it, broadcast join — the fact table is scanned once."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("v_c"),
    )
    d = e.groupBy("event_type", "dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_c").cast("bigint").alias("sum_c"),
    )
    t = d.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("sum_c").cast("bigint").alias("sum_all"),
    )
    return d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "n",
        F.expr("sum_c * n_all * 10000 div (n * sum_all)")
        .cast("bigint")
        .alias("index_bp"),
    )


@query(
    "q_calibration_bins",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS n_views,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT ((n_views * 10000) - (n_views * 10000) % (n_views + 5))
             / (n_views + 5) AS pred_bp, converted
      FROM u
    )
    SELECT CAST((pred_bp - pred_bp % 1000) / 1000 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_conv,
           CAST((SUM(pred_bp) - SUM(pred_bp) % COUNT(*)) / COUNT(*)
                AS BIGINT) AS mean_pred_bp,
           CAST(((SUM(converted) * 10000)
                 - (SUM(converted) * 10000) % COUNT(*)) / COUNT(*)
                AS BIGINT)
             AS actual_bp
    FROM p GROUP BY bin
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) table for a deterministic propensity
    score: users are scored by a saturating view-count propensity
    pred_bp = 10000*v/(v+5), binned into ten fixed-width buckets, and
    each bin reports mean predicted vs actual conversion rate — the
    reliability diagram every scored-model deployment is validated
    with (q_auc_rank ranks, q_gains_table accumulates; this checks
    the SCORE SCALE itself).

    One user-keyed collapse then a 10-key hash aggregate; everything
    is exact integer arithmetic (scores and rates in basis points via
    integer division), so bins and rates are bit-identical across
    engines. Aggregate state is bounded by the bin count — scale-free."""
    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("n_views"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    p = u.select(
        F.expr("(n_views * 10000) div (n_views + 5)").alias("pred_bp"),
        "converted",
    )
    return (
        p.groupBy(F.expr("pred_bp div 1000").cast("bigint").alias("bin"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_conv"),
            F.expr("sum(pred_bp) div count(*)")
            .cast("bigint")
            .alias("mean_pred_bp"),
            F.expr("(sum(converted) * 10000) div count(*)")
            .cast("bigint")
            .alias("actual_bp"),
        )
    )
