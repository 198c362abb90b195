"""Finance indicator family: the EWM grouped-map operator against an
explicit brute-force recurrence, and shape checks for the indicator
queries (oracle parity runs separately in test_oracle_parity.py)."""

from __future__ import annotations

import math

from conftest import SF_SMOKE


def _brute_ema(values: list[float], span: int) -> list[float]:
    """Reference recurrence: adjust=False EMA seeded at first value."""
    alpha = 2.0 / (span + 1.0)
    out: list[float] = []
    for x in values:
        out.append(x if not out else (1 - alpha) * out[-1] + alpha * x)
    return out


def test_ewm_smooth_matches_brute_force(spark):
    from stock_prediction_data_engineering_spark.operators.ewm import ewm_smooth

    rows = [
        ("a", i, float(v))
        for i, v in enumerate([10, 12, 11, 15, 14, 13, 18, 17, 16, 20])
    ] + [("b", i, float(v)) for i, v in enumerate([5, 5, 6, 4, 7, 3])]
    df = spark.createDataFrame(rows, "key string, seq int, value double")

    out = ewm_smooth(df, ["key"], ["seq"], "value", spans=[3, 5])
    got = {
        (r.key, r.seq): (r.ema_3, r.ema_5)
        for r in out.collect()
    }
    for key in ("a", "b"):
        vals = [v for k, _, v in rows if k == key]
        for span_idx, span in enumerate((3, 5)):
            expect = _brute_ema(vals, span)
            for seq, e in enumerate(expect):
                g = got[(key, seq)][span_idx]
                assert math.isclose(g, e, rel_tol=1e-12), (key, span, seq, g, e)


def test_macd_features_matches_brute_force(spark):
    from stock_prediction_data_engineering_spark.operators.ewm import macd_features

    vals = [float(v) for v in [100, 102, 101, 105, 107, 103, 108, 110, 109, 112, 111, 115]]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, seq int, value double")

    out = {r.seq: r for r in macd_features(df, ["key"], ["seq"], "value").collect()}

    fast = _brute_ema(vals, 12)
    slow = _brute_ema(vals, 26)
    macd = [f - s for f, s in zip(fast, slow)]
    signal = _brute_ema(macd, 9)
    for i in range(len(vals)):
        r = out[i]
        assert math.isclose(r.ema_fast, fast[i], rel_tol=1e-12)
        assert math.isclose(r.ema_slow, slow[i], rel_tol=1e-12)
        assert math.isclose(r.macd, macd[i], rel_tol=1e-12, abs_tol=1e-12)
        assert math.isclose(r.macd_signal, signal[i], rel_tol=1e-12, abs_tol=1e-12)
        assert math.isclose(
            r.macd_hist, macd[i] - signal[i], rel_tol=1e-12, abs_tol=1e-12
        )


def test_q_ema_macd_shape(spark):
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_ema_macd"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "event_id",
        "user_id",
        "ema_fast",
        "ema_slow",
        "macd",
        "macd_signal",
        "macd_hist",
    ]
    assert all(
        r.macd_hist is not None and abs(r.macd - (r.ema_fast - r.ema_slow)) < 1e-9
        for r in rows
    )


def test_q_market_beta_sanity(spark):
    """Betas exist, are finite, and the n_days-weighted mean beta sits
    near 1 (each key's series is regressed on an average it is part
    of)."""
    from stock_prediction_data_engineering_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_market_beta"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.beta_c is not None for r in rows if r.n_days > 1)
    wsum = sum(r.beta_c / 10000 * r.n_days for r in rows if r.beta_c is not None)
    w = sum(r.n_days for r in rows if r.beta_c is not None)
    assert 0.2 < wsum / w < 1.8, wsum / w
