"""Joins (SURVEY.md §2.3).

Reference lineage: the processed-symbols file is the output of an
inner equi-join between the raw screener dimension and a per-symbol
probe (SURVEY §2.9); semi/anti are its membership/complement
("symbols having/lacking data"). The rest is the standard join
surface the engine must provide for feature assembly.

Plan posture: small dims (region/nation/bands) broadcast; the
multiway star join lets AQE pick broadcast vs sort-merge per stage;
the as-of join is the union+window operator (operators/asof.py), not
a nested-loop range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from ..registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact ⨝ dim (J1)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (J2) — unmatched dimension rows survive with
    null payload."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (J3): "symbols having data" membership filter."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (J4): the complement — the reference's 5,907
    excluded symbols."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_multiway",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY region_name, nation_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join (J5) with broadcast hints on the fixed-
    size dims (J6). At 100 TB: lineitem⨝orders is the only real
    shuffle; customer/nation/region broadcast."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


PRICE_BANDS = [
    (0.0, 1200.0, "budget"),
    (1200.0, 1500.0, "standard"),
    (1500.0, 1800.0, "premium"),
    (1800.0, 1e12, "luxury"),
]


@query(
    "q_join_range",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM part p
    JOIN (VALUES (0.0, 1200.0, 'budget'),
                 (1200.0, 1500.0, 'standard'),
                 (1500.0, 1800.0, 'premium'),
                 (1800.0, 1e12, 'luxury')) AS b(lo, hi, band)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join (J7): price-band lookup. The band table is
    tiny and broadcast, so the plan is BroadcastNestedLoop over a
    constant-size inner — linear in the fact side, scale-safe."""
    from ..functions.exact import dsum

    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, "lo double, hi double, band string")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice").alias("sum_price"))
    )


@query(
    "q_join_asof",
    # dual-dialect (round 8): DuckDB ASOF JOIN re-expressed as
    # the shared max-timestamp-per-probe + unique join-back form
    # (quote is unique on (user_id, ts)); epoch_us via the
    # explicit-extract macro
    oracle="""
    WITH probe AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    quote AS (
        SELECT user_id, ts, MAX(value) AS quote_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    best AS (
        SELECT p.event_id, MAX(q.ts) AS qts
        FROM probe p JOIN quote q
          ON p.user_id = q.user_id AND q.ts <= p.ts
        GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           ((CAST(extract(day from CAST(CAST(p.ts AS DATE) AS TIMESTAMP) - TIMESTAMP '1970-01-01') AS BIGINT)*86400 + CAST(extract(hour from p.ts) AS BIGINT)*3600 + CAST(extract(minute from p.ts) AS BIGINT)*60 + CAST(extract(second from p.ts) AS BIGINT)) * 1000000 + (CASE WHEN position('.' in CAST(p.ts AS STRING)) = 0 THEN 0 ELSE CAST(rpad(substring(CAST(p.ts AS STRING), position('.' in CAST(p.ts AS STRING)) + 1), 6, '0') AS BIGINT) END)) AS probe_ts_us,
           ((CAST(extract(day from CAST(CAST(b.qts AS DATE) AS TIMESTAMP) - TIMESTAMP '1970-01-01') AS BIGINT)*86400 + CAST(extract(hour from b.qts) AS BIGINT)*3600 + CAST(extract(minute from b.qts) AS BIGINT)*60 + CAST(extract(second from b.qts) AS BIGINT)) * 1000000 + (CASE WHEN position('.' in CAST(b.qts AS STRING)) = 0 THEN 0 ELSE CAST(rpad(substring(CAST(b.qts AS STRING), position('.' in CAST(b.qts AS STRING)) + 1), 6, '0') AS BIGINT) END)) AS quote_ts_us,
           q.quote_value
    FROM probe p
    LEFT JOIN best b ON p.event_id = b.event_id
    LEFT JOIN quote q ON q.user_id = p.user_id AND q.ts = b.qts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J8): each purchase event annotated with the latest
    preceding click of the same user. Implemented with the union+window
    operator (one shuffle); oracle is DuckDB's native ASOF JOIN.

    The quote side is pre-aggregated to one row per (user, ts) so the
    same-timestamp winner is deterministic on both engines.
    """
    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    quote = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("quote_value"))
    )
    joined = asof_join(
        probe,
        quote,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "quote_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("probe_ts_us"),
        F.unix_micros("ts_asof").alias("quote_ts_us"),
        F.col("quote_value_asof").alias("quote_value"),
    )


@query(
    "q_join_asof_forward",
    # dual-dialect (round 8): forward ASOF as min-timestamp-per-
    # probe + unique join-back; tolerance window via shared
    # timestamp-interval comparison
    oracle="""
    WITH probe AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    quote AS (
        SELECT user_id, ts, MAX(value) AS next_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    best AS (
        SELECT p.event_id, MIN(q.ts) AS qts
        FROM probe p JOIN quote q
          ON p.user_id = q.user_id AND q.ts >= p.ts
        GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           ((CAST(extract(day from CAST(CAST(p.ts AS DATE) AS TIMESTAMP) - TIMESTAMP '1970-01-01') AS BIGINT)*86400 + CAST(extract(hour from p.ts) AS BIGINT)*3600 + CAST(extract(minute from p.ts) AS BIGINT)*60 + CAST(extract(second from p.ts) AS BIGINT)) * 1000000 + (CASE WHEN position('.' in CAST(p.ts AS STRING)) = 0 THEN 0 ELSE CAST(rpad(substring(CAST(p.ts AS STRING), position('.' in CAST(p.ts AS STRING)) + 1), 6, '0') AS BIGINT) END)) AS probe_ts_us,
           CASE WHEN q.ts - p.ts <= INTERVAL 2 HOUR
                THEN ((CAST(extract(day from CAST(CAST(q.ts AS DATE) AS TIMESTAMP) - TIMESTAMP '1970-01-01') AS BIGINT)*86400 + CAST(extract(hour from q.ts) AS BIGINT)*3600 + CAST(extract(minute from q.ts) AS BIGINT)*60 + CAST(extract(second from q.ts) AS BIGINT)) * 1000000 + (CASE WHEN position('.' in CAST(q.ts AS STRING)) = 0 THEN 0 ELSE CAST(rpad(substring(CAST(q.ts AS STRING), position('.' in CAST(q.ts AS STRING)) + 1), 6, '0') AS BIGINT) END)) END AS next_ts_us,
           CASE WHEN q.ts - p.ts <= INTERVAL 2 HOUR
                THEN q.next_value END AS next_value
    FROM probe p
    LEFT JOIN best b ON p.event_id = b.event_id
    LEFT JOIN quote q ON q.user_id = p.user_id AND q.ts = b.qts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (J8 variant, the pandas merge_asof
    surface): each purchase annotated with the same user's NEXT click
    within 2 hours, or nulls if none. Same single-shuffle union+window
    plan as backward — the timeline is just scanned in reverse; oracle
    is DuckDB's native forward ASOF (p.ts <= q.ts) with an interval
    guard."""
    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    quote = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("next_value"))
    )
    joined = asof_join(
        probe,
        quote,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "next_value"],
        direction="forward",
        tolerance="2 hours",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("probe_ts_us"),
        F.unix_micros("ts_asof").alias("next_ts_us"),
        F.col("next_value_asof").alias("next_value"),
    )


@query(
    "q_join_skew_split",
    oracle="""
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_acctbal
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id
    """,
)
def q_join_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim join executed through the differentiated skew join
    (operators/skew.py skew_split_join): the fact side's measured hot
    keys take a salted path against only the dim's hot-key rows, the
    cold remainder joins plain, and the union is provably identical to
    the unsalted join — which is exactly what the oracle asserts. The
    hot-key set comes from the same frequency profile `q_heavy_keys`
    exposes.

    At 100 TB this is the shape for a fact whose key histogram has a
    heavy head (one symbol dominating the tape): AQE's skew split
    handles moderate skew; the split join bounds the straggler by
    construction and keeps small-side replication at |hot| rows.

    Build-time cost note: hot-key detection is a driver-bounded
    top-8 count over a 20 % SAMPLE of the fact side, collected when
    the plan is constructed — the same cost class as a range
    partitioner's sampling pass (and q_ntile's count job), NOT a full
    fact scan; hot keys only steer placement, so sampling error never
    affects results (the oracle equality proves it)."""
    from ..operators.skew import skew_split_join

    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_acctbal"
    )
    joined = skew_split_join(
        ev, cust, ["user_id"], num_salts=8, top_n=8, sample_fraction=0.2
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_acctbal"),
    )


@query(
    "q_join_full",
    oracle="""
    WITH f AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_final
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ),
    p AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_pending
      FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
    )
    SELECT COALESCE(f.o_custkey, p.o_custkey) AS custkey,
           COALESCE(f.n_final, 0) AS n_final,
           COALESCE(p.n_pending, 0) AS n_pending
    FROM f FULL JOIN p ON f.o_custkey = p.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (J2 completeness): reconcile two per-key
    aggregates where each side has keys the other lacks — the shape of
    a two-source reconciliation report (e.g. symbols present in one
    vendor feed but not the other; the reference's raw-vs-processed
    symbol diff is the semi/anti special case of this).

    Scale shape: both inputs are keyed aggregates on the SAME key as
    the join, so the aggregate's hash partitioning is reused by the
    sort-merge full join — one exchange per side, no broadcast (full
    outer cannot broadcast either side in Spark; the planner keeps it
    a merge join, which is the right strategy at any scale)."""
    o = table(spark, sf_dir, "orders")
    f = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_final"))
    )
    p = (
        o.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_pending"))
    )
    return f.join(p, "o_custkey", "full").select(
        F.col("o_custkey").alias("custkey"),
        F.coalesce("n_final", F.lit(0)).alias("n_final"),
        F.coalesce("n_pending", F.lit(0)).alias("n_pending"),
    )
