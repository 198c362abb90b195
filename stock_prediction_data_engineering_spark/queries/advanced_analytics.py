"""Advanced analytics surface: CUBE, order statistics (moving median,
equi-depth bins, winsorization, robust z-score), multi-dimensional
dominance (skyline), graph triangles, feature hashing, and linear
gap interpolation.

No reference-repo counterpart (the reference is a 131-line ingest DAG,
reference dags/stock_data_airflow_local_aws_s3.py); this module is
north-star analytics surface on top of the same data model.

Cross-engine float discipline (registry header): order statistics run
on integer cents; medians are emitted DOUBLED (2x the interpolated
value) so the .5 midpoint of an even-count median stays integer; the
one double expression per query (interpolation slope, percentile) is
written token-identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dual_sql as D
from ..registry import query

DEC = "decimal(18,4)"

# exact integer cents of a <=2-decimal double (lossless via DECIMAL)
def _cents(col: str) -> F.Column:
    return (F.col(col).cast(DEC) * 100).cast("bigint")


_CENTS_SQL = "CAST(CAST({c} AS DECIMAL(18,4))*100 AS BIGINT)"


@query(
    "q_cube",
    oracle="""
    SELECT year(o_orderdate) AS order_year, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))*100 AS BIGINT)
             AS revenue_c
    FROM orders
    GROUP BY CUBE(order_year, o_orderstatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (A7 completeness alongside q_rollup and
    q_grouping_sets): all 2^2 grouping combinations of
    (year, status) in ONE pass — Spark expands the cube into a single
    Expand + hash aggregate, so the fact table is scanned once, not
    once per grouping set. Revenue is an exact DECIMAL sum in cents."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube(F.year("o_orderdate").alias("order_year"), "o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
            .cast("bigint")
            .alias("revenue_c"),
        )
    )


@query(
    "q_moving_median",
    # dual-dialect: Spark cannot evaluate median as a FRAMED window
    # function, but both engines share the plain median() AGGREGATE
    # (interpolating the even-count midpoint identically), so the
    # 5-row trailing frame becomes a rank-range self-join + GROUP BY —
    # one shared text for all three engines
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             {_CENTS_SQL.format(c='value')} AS v_c,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           CAST(2*median(b.v_c) AS BIGINT) AS med2_c
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 4 AND a.rn
    GROUP BY a.user_id, a.event_id
    """,
)
def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding median (5-row trailing frame) per user — the
    robust counterpart of q_moving_avg. Spark has no holistic median
    window function, so the frame's values are collected into a
    bounded array (<=5 elements — the frame bound, NOT the partition)
    and the median read from the sorted array, entirely JVM-side.
    Emitted as 2*median so the even-count midpoint stays integer.

    Scale: the window is keyed by user_id and the per-row state is
    frame-bounded; cost is O(rows * frame log frame), no different
    from any trailing-frame aggregate."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", _cents("value").alias("v_c")
    )
    return (
        ev.withColumn("arr", F.array_sort(F.collect_list("v_c").over(w)))
        .withColumn(
            "med2_c",
            F.expr(
                "CASE WHEN size(arr) % 2 = 1"
                "  THEN 2*element_at(arr, CAST((size(arr)+1) div 2 AS INT))"
                "  ELSE element_at(arr, CAST(size(arr) div 2 AS INT))"
                "     + element_at(arr, CAST(size(arr) div 2 + 1 AS INT)) END"
            ),
        )
        .select("user_id", "event_id", "med2_c")
    )


@query(
    "q_quantile_bins",
    oracle=f"""
    WITH t AS (
      SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
             {_CENTS_SQL.format(c='o_totalprice')} AS price_c
      FROM orders
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(price_c) AS lo_c, MAX(price_c) AS hi_c,
           CAST(SUM(price_c) AS BIGINT) AS mass_c
    FROM t GROUP BY bin
    """,
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of order totals: every bin holds the
    same row count (NTILE semantics), with exact integer bounds and
    mass per bin — the discretization primitive for feature binning
    and for equi-depth histogram statistics.

    The global NTILE goes through operators/ranking.global_ntile
    (range-partitioned two-phase rank), NOT a single-partition
    window — same distributed scheme the W5 declared query pins."""
    from ..operators.ranking import global_ntile

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", _cents("o_totalprice").alias("price_c")
    )
    binned = global_ntile(
        o, 10, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()], "bin"
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("price_c").alias("lo_c"),
        F.max("price_c").alias("hi_c"),
        F.sum("price_c").cast("bigint").alias("mass_c"),
    )


@query(
    "q_winsorize",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,4))*100 AS BIGINT) AS bal_c,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    ),
    b AS (
      SELECT c_mktsegment,
             MAX(CASE WHEN rn = ((5*n + 99) - (5*n + 99) % 100) / 100
                      THEN bal_c END) AS lo_c,
             MAX(CASE WHEN rn = ((95*n + 99) - (95*n + 99) % 100) / 100
                      THEN bal_c END) AS hi_c
      FROM r GROUP BY c_mktsegment
    )
    SELECT r.c_mktsegment, b.lo_c, b.hi_c,
           CAST(SUM(CASE WHEN bal_c < lo_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN bal_c > hi_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           CAST(SUM(LEAST(GREATEST(bal_c, lo_c), hi_c)) AS BIGINT)
             AS wins_sum_c
    FROM r JOIN b USING (c_mktsegment)
    GROUP BY r.c_mktsegment, b.lo_c, b.hi_c
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at the empirical P5/P95 per segment: outliers are
    clipped to rank-based bounds (the value at row ceil(0.05*n) /
    ceil(0.95*n) of the segment's sort order — percentile_disc
    semantics, an actual data value), so the whole query is integer
    arithmetic with no interpolation to disagree on.

    Plan: ONE keyed window pass assigns ranks, a segment-sized
    aggregate extracts the two bound rows, and a broadcast join feeds
    the conditional clip aggregate — the fact table is scanned once
    and shuffled once (by segment)."""
    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal", _cents("c_acctbal").alias("bal_c")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    r = c.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    # rank formula ceil(p*n/100) = (p*n + 99) div 100, integer-exact
    bounds = r.groupBy("c_mktsegment").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(5*n + 99) div 100"), F.col("bal_c"))
        ).alias("lo_c"),
        F.max(
            F.when(F.col("rn") == F.expr("(95*n + 99) div 100"), F.col("bal_c"))
        ).alias("hi_c"),
    )
    return (
        r.join(F.broadcast(bounds), "c_mktsegment")
        .groupBy("c_mktsegment", "lo_c", "hi_c")
        .agg(
            F.sum(F.when(F.col("bal_c") < F.col("lo_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("bal_c") > F.col("hi_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_hi"),
            F.sum(F.least(F.greatest("bal_c", "lo_c"), "hi_c"))
            .cast("bigint")
            .alias("wins_sum_c"),
        )
    )


@query(
    "q_skyline",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(CAST(p_retailprice AS DECIMAL(18,4))*100 AS BIGINT)
               AS price_c,
             p_size
      FROM part
    )
    SELECT a.p_partkey, a.price_c, a.p_size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
        AND (b.price_c < a.price_c OR b.p_size > a.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (price low, size high). The oracle is the quadratic NOT EXISTS;
    the Spark plan is the distributed two-phase scheme
    (operators/skyline.py):

    1. local prune — rows are hash-grouped (any grouping works: a
       locally dominated row is globally dominated) and each group's
       skyline found with two KEYED windows: max size among strictly
       cheaper rows (RANGE .. 1 PRECEDING) and max size at the same
       price. No single-partition window anywhere.
    2. global verify — the surviving candidates (frontier-sized, tiny)
       are broadcast and dominance-checked pairwise with a left-anti
       join.

    At 100 TB step 1 does all the data-sized work with keyed shuffles
    only; step 2's candidate set is bounded by the number of distinct
    price levels per group, not by row count."""
    from ..operators.skyline import skyline_2d

    p = table(spark, sf_dir, "part").select(
        "p_partkey", _cents("p_retailprice").alias("price_c"), "p_size"
    )
    return skyline_2d(p, minimize="price_c", maximize="p_size")


@query(
    "q_triangle_count",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, CAST(l_shipdate AS DATE) AS d,
                      l_suppkey AS s
      FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.s AS x, b.s AS y
      FROM ps a JOIN ps b ON a.p = b.p AND a.d = b.d AND a.s < b.s
    ),
    nodes AS (SELECT DISTINCT x AS v FROM e UNION SELECT DISTINCT y FROM e)
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1 JOIN e e2 ON e1.y = e2.x
                           JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
                AS BIGINT) AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-shipment graph (edge =
    two suppliers shipped the same part on the same day) — the graph
    clustering primitive behind community/cohesion metrics, and the
    oracle-backed companion to the rows-only q_pagerank.

    Spark plan is the DEGREE-ORIENTED algorithm (the distributed
    standard; operators/graph.py count_triangles): each undirected
    edge is oriented from its lower
    (degree, id) endpoint to the higher, wedges are generated only
    from out-neighbor pairs, and a final join checks the closing
    edge. Orientation bounds every node's out-degree by O(sqrt(E)),
    so the wedge explosion a hub node would cause in the naive a<b<c
    three-way self-join cannot happen — that naive form is exactly
    the oracle, correct at test scale and hub-bombed at 100 TB."""
    from ..operators.graph import count_triangles

    li = table(spark, sf_dir, "lineitem")
    # edge generation WITHOUT a self-join: collect each (part, day)'s
    # supplier set (bounded by suppliers-per-part-per-day — single
    # digits in this domain) and explode its ordered pairs JVM-side.
    # One shuffle by (p, d) instead of shuffling both join sides; the
    # pair blowup is per-group |S|², the same bound the self-join had.
    grp = (
        li.select(
            F.col("l_partkey").alias("p"),
            F.to_date("l_shipdate").alias("d"),
            F.col("l_suppkey").alias("s"),
        )
        .groupBy("p", "d")
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
    )
    pairs = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)), y -> struct(x AS x, y AS y))))"
    )
    edges = (
        grp.select(F.explode(pairs).alias("e"))
        .select("e.x", "e.y")
        .distinct()
    )
    return count_triangles(edges)


@query(
    "q_feature_hashing",
    # dual-dialect: shared alnum-run tokenizer; %64 needs only the
    # last two digits of the 15-hex prefix (positional hex decode —
    # see dual_sql.hex_int), the sign bit only digit 16
    oracle=f"""
    WITH h AS (
      SELECT {D.hex_int('substring(md5(tok), 14, 2)', 2)} % 64 AS bucket,
             CASE WHEN {D.hex_int('substring(md5(tok), 16, 1)', 1)} % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM {D.alnum_tokens()} a
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(sgn) AS BIGINT) AS net_weight
    FROM h GROUP BY bucket
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (signed feature hashing a la Vowpal Wabbit):
    every token maps to one of 64 buckets via a content hash, with a
    +/-1 sign bit from an independent hash bit so collisions cancel in
    expectation. md5 (not xxhash64) because both engines implement it
    identically — the same engine-portability choice as q_train_split.

    Scale shape: narrow map + explode + one 64-key aggregate; the
    bucket dimension is fixed, so the reduce side never grows with
    the corpus."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"[^a-z0-9]+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("tok")
        )
    )
    h = toks.select(
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"),
            F.lit(64),
        ).alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5("tok"), 16, 1), 16, 10).cast("bigint") % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    return h.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("sgn").cast("bigint").alias("net_weight"),
    )


@query(
    "q_robust_zscore",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS v_c
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(2*median(v_c) AS BIGINT) AS med2_c
      FROM v GROUP BY event_type
    ),
    d AS (
      SELECT v.event_type, abs(2*v_c - med2_c) AS dev2, med2_c
      FROM v JOIN m USING (event_type)
    ),
    mad AS (
      SELECT event_type, CAST(2*median(dev2) AS BIGINT) AS mad4_c
      FROM d GROUP BY event_type
    )
    SELECT d.event_type, med2_c, mad4_c,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN 4*dev2 > 7*mad4_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type, med2_c, mad4_c
    """,
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier gate — the robust counterpart of the
    mean/sigma q_anomaly_gate (stats.py): outliers cannot inflate the
    location/scale estimates that define them. All integer: medians
    are emitted doubled (med2 = 2*median of cents, mad4 = 4*MAD), and
    the |z| > 3.5 gate becomes 4*dev2 > 7*mad4 — cross-multiplied,
    no division, no consistency constant.

    Plan: two keyed aggregates (median, MAD) with broadcast joins
    back to the fact — three scans total, each a keyed exchange; the
    exact median is the only holistic aggregate and runs per key."""
    v = table(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("v_c")
    )
    m = v.groupBy("event_type").agg(
        (2 * F.percentile("v_c", F.lit(0.5))).cast("bigint").alias("med2_c")
    )
    d = v.join(F.broadcast(m), "event_type").withColumn(
        "dev2", F.abs(2 * F.col("v_c") - F.col("med2_c"))
    )
    mad = d.groupBy("event_type").agg(
        (2 * F.percentile("dev2", F.lit(0.5))).cast("bigint").alias("mad4_c")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med2_c", "mad4_c")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.when(4 * F.col("dev2") > 7 * F.col("mad4_c"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "q_gapfill_interp",
    # dual-dialect: numbers-join spine; both IGNORE NULLS directions
    # via the count-over-grouping identity (forward/backward running
    # non-null counts, one non-null per group — see q_gapfill_daily);
    # date_diff('day', ..) via the shared interval-extract form
    oracle=f"""
    WITH daily AS (
      SELECT user_id, day, close_c FROM (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(CAST(value AS DECIMAL(18,4))*100 AS BIGINT) AS close_c,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) q WHERE rn = 1
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
      SELECT s.user_id, s.day, d.close_c,
             d.day IS NOT NULL AS is_observed,
             COUNT(d.close_c) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fg,
             COUNT(d.close_c) OVER (
               PARTITION BY s.user_id ORDER BY s.day DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bg
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    ),
    f AS (
      SELECT user_id, day, close_c, is_observed,
             MAX(close_c) OVER (PARTITION BY user_id, fg) AS pc,
             MAX(CASE WHEN is_observed THEN day END)
               OVER (PARTITION BY user_id, fg) AS pd,
             MAX(close_c) OVER (PARTITION BY user_id, bg) AS nc,
             MAX(CASE WHEN is_observed THEN day END)
               OVER (PARTITION BY user_id, bg) AS nd
      FROM j
    )
    SELECT user_id, day, is_observed,
           CASE WHEN is_observed THEN close_c
                ELSE pc + CAST(FLOOR(CAST((nc - pc) AS DOUBLE)
                                     * {D.days_between('pd', 'day')}
                                     / {D.days_between('pd', 'nd')})
                               AS BIGINT) END AS interp_c
    FROM f
    """,
)
def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over calendar gaps — the companion of the
    forward-fill q_gapfill_daily: missing days get the straight line
    between the surrounding observed closes, in integer cents via one
    FLOOR of the (token-identical) double slope expression.

    Plan: per-key daily collapse, JVM sequence() spine, and TWO
    keyed window passes (carry-last backward, carry-first forward) —
    one shuffle by user end to end; per-key state is O(1)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        _col_cents(
            F.max_by("value", F.struct(F.col("ts"), F.col("event_id")))
        ).alias("close_c")
    )
    spine = daily.groupBy("user_id").agg(
        F.sequence(F.min("day"), F.max("day")).alias("days")
    ).select("user_id", F.explode("days").alias("day"))
    j = spine.join(daily, ["user_id", "day"], "left").withColumn(
        "is_observed", F.col("close_c").isNotNull()
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("is_observed"), F.col("day"))
    f = (
        j.withColumn("pc", F.last("close_c", ignorenulls=True).over(wb))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("nc", F.first("close_c", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(wf))
    )
    interp = F.when(F.col("is_observed"), F.col("close_c")).otherwise(
        F.col("pc")
        + F.floor(
            (F.col("nc") - F.col("pc")).cast("double")
            * F.datediff(F.col("day"), F.col("pd"))
            / F.datediff(F.col("nd"), F.col("pd"))
        ).cast("bigint")
    )
    return f.select(
        "user_id", "day", "is_observed", interp.alias("interp_c")
    )


def _col_cents(c: F.Column) -> F.Column:
    return (c.cast(DEC) * 100).cast("bigint")


@query(
    "q_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,4))*100 AS BIGINT)
               AS price_c,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, price_c,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM g
    )
    SELECT l_returnflag, CAST(MIN(price_c) AS BIGINT) AS wmedian_c,
           CAST(MIN(tot) AS BIGINT) AS total_w
    FROM c WHERE 2 * cum >= tot GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag: the
    smallest price whose cumulative quantity reaches half the total —
    the robust per-segment price level (an unweighted median treats a
    1-unit and a 50-unit line alike).

    Scale argument: the corpus-sized work is the (flag, price_c)
    pre-aggregate — a keyed, map-side-combined hash aggregate. The
    cumulative window that follows runs per flag over DISTINCT PRICES
    only, and the cents price domain is bounded (~1e7 values)
    regardless of corpus size, so the per-key window input cannot
    grow with the data — unlike a naive row-level cumsum, which would
    concentrate the whole corpus into |flag| window partitions.
    Weights are integral quantities; the half-total test is the
    integer cross-multiplication 2*cum >= tot. No floats anywhere."""
    li = table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy(
            "l_returnflag",
            (F.col("l_extendedprice").cast(DEC) * 100)
            .cast("bigint")
            .alias("price_c"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price_c",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_c").cast("bigint").alias("wmedian_c"),
            F.min("tot").cast("bigint").alias("total_w"),
        )
    )
