"""Property-based tests (hypothesis) for the hand-built operators —
the ones whose semantics Spark does not give us for free. Each example
is checked against a brute-force Python oracle, so these hunt the
edge cases fixed fixtures miss (empty sides, ties, all-one-key skew,
keys present on only one side).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = ("a", "b", "c")

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30), st.integers(-5, 5)),
    min_size=0,
    max_size=15,
)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30), st.integers(100, 200)),
    min_size=0,
    max_size=15,
)

prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(lrows=left_rows, rrows=right_rows)
@prop_settings
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    from stock_prediction_data_engineering_spark.operators.asof import asof_join

    # right must be unique per (key, ts) — the operator's documented
    # precondition
    seen = {}
    for k, ts, v in rrows:
        seen.setdefault((k, ts), v)
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]

    left = spark.createDataFrame(lrows, "k string, ts int, lval int")
    right = spark.createDataFrame(rrows, "k string, ts int, rval int")
    out = asof_join(left, right, "k", "ts", "ts", ["rval"]).collect()

    def expect(k, ts):
        cands = [(rts, v) for (rk, rts, v) in rrows if rk == k and rts <= ts]
        return max(cands)[1] if cands else None

    got = sorted((r.k, r.ts, r.lval, r.rval_asof) for r in out)
    want = sorted((k, ts, lv, expect(k, ts)) for (k, ts, lv) in lrows)
    assert got == want


@given(lrows=left_rows, rrows=right_rows)
@prop_settings
def test_asof_forward_with_tolerance_matches_bruteforce(spark, lrows, rrows):
    from stock_prediction_data_engineering_spark.operators.asof import asof_join

    seen = {}
    for k, ts, v in rrows:
        seen.setdefault((k, ts), v)
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]

    left = spark.createDataFrame(lrows, "k string, ts int, lval int")
    right = spark.createDataFrame(rrows, "k string, ts int, rval int")
    out = asof_join(
        left, right, "k", "ts", "ts", ["rval"],
        direction="forward", tolerance=5,
    ).collect()

    def expect(k, ts):
        cands = [(rts, v) for (rk, rts, v) in rrows if rk == k and ts <= rts <= ts + 5]
        return min(cands)[1] if cands else None

    got = sorted((r.k, r.ts, r.lval, r.rval_asof) for r in out)
    want = sorted((k, ts, lv, expect(k, ts)) for (k, ts, lv) in lrows)
    assert got == want


@given(
    obs=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 20), st.integers(-5, 5)),
        min_size=1,
        max_size=15,
    )
)
@prop_settings
def test_gapfill_matches_bruteforce(spark, obs):
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.resample import (
        calendar_gapfill,
    )

    # one observation per (key, day)
    seen = {}
    for k, d, v in obs:
        seen.setdefault((k, d), v)
    obs = [(k, d, v) for (k, d), v in seen.items()]

    df = spark.createDataFrame(obs, "k string, d int, v int").select(
        "k", F.date_add(F.lit("2024-01-01").cast("date"), F.col("d")).alias("d"), "v"
    )
    out = calendar_gapfill(df, ["k"], "d", ["v"]).collect()

    per_key = {}
    for k, d, v in obs:
        per_key.setdefault(k, {})[d] = v
    want = []
    for k, days in per_key.items():
        lo, hi = min(days), max(days)
        last = None
        for d in range(lo, hi + 1):
            observed = d in days
            if observed:
                last = days[d]
            want.append((k, d, last, observed))
    got = sorted(
        (
            r.k,
            (r.d - __import__("datetime").date(2024, 1, 1)).days,
            r.v,
            r.is_observed,
        )
        for r in out
    )
    assert got == sorted(want)


@given(
    fact=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 9)), min_size=0, max_size=20
    ),
    dim=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 9)), min_size=0, max_size=6
    ),
    how=st.sampled_from(["inner", "left"]),
)
@prop_settings
def test_salted_join_matches_bruteforce(spark, fact, dim, how):
    from stock_prediction_data_engineering_spark.operators.skew import salted_join

    fdf = spark.createDataFrame(fact, "k string, v int")
    ddf = spark.createDataFrame(dim, "k string, d int")
    got = sorted(
        (r.k, r.v, r.d)
        for r in salted_join(fdf, ddf, ["k"], num_salts=4, how=how).collect()
    )

    want = []
    for k, v in fact:
        matches = [d for (dk, d) in dim if dk == k]
        if matches:
            want.extend((k, v, d) for d in matches)
        elif how == "left":
            want.append((k, v, None))
    assert got == sorted(want)


def test_global_rank_exact_at_sampling_scale(spark):
    """The two-phase global rank must be exact when the input is big
    enough that RangePartitioner samples instead of reading whole —
    the regime where unpinned cross-job boundaries drift (caught at
    sf0.1: ranks off by ±40)."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.ranking import (
        _with_global_rank,
    )

    df = spark.range(0, 60_000).select(
        F.xxhash64("id").alias("v"), F.col("id")
    )
    ranked, total = _with_global_rank(df, [F.col("v"), F.col("id")], "r")
    assert total == 60_000
    rows = ranked.select("v", "id", "r").collect()
    want = {
        (v, i): pos + 1
        for pos, (v, i) in enumerate(sorted((r.v, r.id) for r in rows))
    }
    assert all(want[(r.v, r.id)] == r.r for r in rows)


pack_rows = st.lists(
    st.tuples(
        st.sampled_from(KEYS),      # group
        st.integers(0, 50),         # order key (may tie across groups)
        st.integers(0, 120),        # token count (0 = empty doc)
    ),
    min_size=0,
    max_size=30,
)


@given(rows=pack_rows, capacity=st.sampled_from([1, 7, 64]))
@prop_settings
def test_pack_assignment_matches_bruteforce(spark, rows, capacity):
    """Concat-and-chunk packing must equal the sequential fold: within
    each group (ordered by the order key, ties broken by nothing —
    so dedupe order keys per group first), pack_id/pack_offset are the
    div/mod of the running token total before the row."""
    from stock_prediction_data_engineering_spark.queries.llm_pipeline import (
        pack_assignment,
    )

    # unique order key per group — the operator's documented layout
    # determinism needs a total per-group order
    seen = {}
    for g, o, t in rows:
        seen.setdefault((g, o), t)
    rows = [(g, o, t) for (g, o), t in seen.items()]

    df = spark.createDataFrame(rows, "g string, o int, t long")
    got = {
        (r.g, r.o): (r.pack_id, r.pack_offset)
        for r in pack_assignment(df, "g", "o", "t", capacity).collect()
    }

    want = {}
    for g in {g for g, _, _ in rows}:
        cum = 0
        for o, t in sorted((o, t) for gg, o, t in rows if gg == g):
            want[(g, o)] = (cum // capacity, cum % capacity)
            cum += t
    assert got == want
    # invariants: offsets bounded, pack ids start at 0 and never skip
    # backwards in order
    for g in {g for g, _, _ in rows}:
        ordered = [got[(g, o)] for o in sorted(o for gg, o, _ in rows if gg == g)]
        assert all(0 <= off < capacity for _, off in ordered)
        if ordered:
            assert ordered[0] == (0, 0)
            assert all(a[0] <= b[0] for a, b in zip(ordered, ordered[1:]))


@given(fact=left_rows, dim=right_rows, how=st.sampled_from(["inner", "left"]))
@prop_settings
def test_skew_split_join_matches_plain_join(spark, fact, dim, how):
    """The hot/cold split must be invisible: for any hot-key set the
    union of the salted-hot and plain-cold branches equals the plain
    join row-for-row (multiplicity included)."""
    from stock_prediction_data_engineering_spark.operators.skew import skew_split_join

    fact = [(k, v) for k, _, v in fact]
    dim = [(k, d) for k, _, d in dim]
    fdf = spark.createDataFrame(fact, "k string, v int") if fact else (
        spark.createDataFrame([], "k string, v int")
    )
    ddf = spark.createDataFrame(dim, "k string, d int") if dim else (
        spark.createDataFrame([], "k string, d int")
    )

    # hot set: auto-detected from the fact side (top-2), exercising the
    # measurement path on every example
    got = sorted(
        (r.k, r.v, r.d)
        for r in skew_split_join(
            fdf, ddf, ["k"], num_salts=4, top_n=2, how=how
        ).collect()
    )

    want = []
    for k, v in fact:
        matches = [d for (dk, d) in dim if dk == k]
        if matches:
            want.extend((k, v, d) for d in matches)
        elif how == "left":
            want.append((k, v, None))
    assert got == sorted(want)


@given(
    stream=st.lists(st.integers(0, 12), min_size=0, max_size=120),
    capacity=st.integers(1, 6),
    n_chunks=st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_spacesaving_merge_guarantees(stream, capacity, n_chunks):
    """Pure-Python property check of the space-saving fold (no Spark):
    for ANY stream, chunking, and capacity — estimates never
    under-count, the recorded error bounds each overshoot, the summary
    never exceeds capacity, and every key with true count > N/capacity
    is present (the Metwally guarantee)."""
    import pandas as pd

    from stock_prediction_data_engineering_spark.streaming.heavy_hitters import (
        _spacesaving_merge,
    )

    sketch = {}
    step = max(1, len(stream) // n_chunks)
    for i in range(0, max(len(stream), 1), step):
        chunk = stream[i : i + step]
        if chunk:
            _spacesaving_merge(sketch, pd.Series(chunk).value_counts(), capacity)

    truth = {}
    for x in stream:
        truth[x] = truth.get(x, 0) + 1
    n = len(stream)

    assert len(sketch) <= capacity
    for key, (est, err) in sketch.items():
        true = truth.get(key, 0)
        assert est >= true            # over-count only
        assert est - err <= true      # err bounds the overshoot
    for key, true in truth.items():
        if true > n / capacity:
            assert key in sketch, (key, true, n, capacity)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(-9, 9)),
        min_size=0,
        max_size=25,
    )
)
@prop_settings
def test_global_running_sum_matches_bruteforce(spark, rows):
    """global_running_sum must equal a sequential prefix sum over the
    total order for ANY input, including duplicates in the non-key
    column, negative values, and the empty frame — the broadcast
    offsets and per-partition cumsums must stitch seamlessly at every
    range-partition boundary."""
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.ranking import (
        global_running_sum,
    )

    # unique order keys (the helper requires a total order)
    uniq = {}
    for k, v in rows:
        uniq.setdefault(k, v)
    rows = sorted(uniq.items())
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, v int")
    out = global_running_sum(df, [F.col("k").asc()], "v", "run")
    got = {r.k: r.run for r in out.collect()}
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc, (k, got[k], acc)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    )
)
@prop_settings
def test_skyline_two_phase_matches_bruteforce(spark, pts):
    """The two-phase distributed skyline (keyed local prune +
    broadcast dominance verify) must equal the quadratic definition
    for ANY point set — ties on either dimension, duplicate points,
    and single-point inputs are the edge cases the window bounds
    (RANGE .. 1 PRECEDING, same-price max) must get right."""
    from stock_prediction_data_engineering_spark.operators.skyline import (
        skyline_2d,
    )

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, price int, size int")
    got = sorted(
        (r.id, r.price, r.size)
        for r in skyline_2d(df, minimize="price", maximize="size").collect()
    )
    want = sorted(
        (i, p, s)
        for (i, p, s) in rows
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for (_j, p2, s2) in rows
        )
    )
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
@prop_settings
def test_triangle_count_matches_bruteforce(spark, pairs):
    """Degree-oriented triangle counting must equal the brute-force
    enumeration for ANY graph — the orientation tie-break on equal
    degrees is where a subtle wedge double-count or miss would hide."""
    from itertools import combinations

    from stock_prediction_data_engineering_spark.operators.graph import (
        count_triangles,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not edges:
        return
    df = spark.createDataFrame(edges, "x int, y int")
    row = count_triangles(df).collect()[0]
    eset = set(edges)
    nodes = sorted({v for e in edges for v in e})
    want = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    assert row.n_triangles == want, (edges, row.n_triangles, want)
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(edges)


@given(
    vals=st.lists(st.integers(0, 500), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_quantile_brackets_contain_exact_percentiles(vals):
    """Pure-Python property check of the sketch bracket extraction
    (no Spark): for ANY value multiset, each percentile's [lo, hi]
    bucket bounds must contain the exact percentile value (smallest
    value whose cumulative count reaches p%), and n must be exact."""
    import math

    from stock_prediction_data_engineering_spark.streaming.quantiles import (
        PCTS,
        quantile_brackets,
    )

    h = {}
    for v in vals:
        b = math.floor(math.sqrt(v))
        h[b] = h.get(b, 0) + 1
    n, brackets = quantile_brackets(h)
    assert n == len(vals)
    assert len(brackets) == 2 * len(PCTS)
    svals = sorted(vals)
    for i, p in enumerate(PCTS):
        idx = -(-p * n // 100)  # ceil
        exact = svals[idx - 1]
        lo, hi = brackets[2 * i], brackets[2 * i + 1]
        assert lo <= exact <= hi, (p, exact, lo, hi, vals)
