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
