"""Semantics tests for operators/timeseries.py (gap fill, TWA, counter rate).

Hand-computed expectations on tiny series — the differential oracle
(scripts/check_correctness.py) covers the corpus-scale agreement; these pin
the per-operator edge semantics: empty buckets, LOCF carry, timestamp ties,
counter resets, single-sample keys.
"""

from __future__ import annotations

import pytest

from observation_lakehouse_spark.operators.timeseries import (
    counter_increase,
    gap_fill,
    time_weighted_avg,
)

STEP = 100  # 100-microsecond grid for readable fixtures


@pytest.fixture(scope="module")
def samples(spark):
    # key 1: samples in buckets 0, 0, 300 (buckets 100/200 empty -> filled)
    # key 2: one sample only (no span)
    # key 3: counter with a reset (10 -> 4) and a timestamp tie
    rows = [
        (1, 10, 2.0, 100),
        (1, 90, 4.0, 101),
        (1, 310, 9.0, 102),
        (2, 50, 5.0, 103),
        (3, 0, 10.0, 104),
        (3, 100, 4.0, 105),
        (3, 100, 6.0, 106),
        (3, 200, 7.0, 107),
    ]
    return spark.createDataFrame(rows, "k bigint, ts bigint, value double, eid bigint")


def test_gap_fill_carries_last_bucket_mean(samples):
    out = {
        (r["k"], r["bucket_us"]): (r["n_obs"], r["value"], r["filled"])
        for r in gap_fill(samples, "k", "ts", "value", STEP).collect()
    }
    # key 1 grid: 0, 100, 200, 300 — bucket 0 mean (2+4)/2 = 3.0
    assert out[(1, 0)] == (2, 3.0, False)
    assert out[(1, 100)] == (0, 3.0, True)  # LOCF carry
    assert out[(1, 200)] == (0, 3.0, True)
    assert out[(1, 300)] == (1, 9.0, False)
    # key 2: single-bucket grid, nothing filled
    assert out[(2, 0)] == (1, 5.0, False)
    # key 3 bucket 100 holds the tied pair: mean (4+6)/2 = 5.0
    assert out[(3, 100)] == (2, 5.0, False)
    assert len(out) == 4 + 1 + 3


def test_time_weighted_avg_weights_by_hold_time(samples):
    out = {r["k"]: r for r in time_weighted_avg(samples, "k", "ts", "value", "eid").collect()}
    # key 1: 2.0 held 80us, 4.0 held 220us, span 300 -> (160+880)/300
    assert out[1]["twa"] == pytest.approx((2.0 * 80 + 4.0 * 220) / 300)
    assert out[1]["n_samples"] == 3 and out[1]["span_us"] == 300
    # key 2: zero span -> dropped
    assert 2 not in out
    # key 3: tie at t=100 -> value 4.0 (eid order) held 0us, 6.0 held 100us
    assert out[3]["twa"] == pytest.approx((10.0 * 100 + 4.0 * 0 + 6.0 * 100) / 200)


def test_counter_increase_detects_resets(samples):
    out = {r["k"]: r for r in counter_increase(samples, "k", "ts", "value", "eid").collect()}
    # key 1 monotone: (4-2) + (9-4) = 7
    assert out[1]["n_resets"] == 0 and out[1]["total_increase"] == 7.0
    # key 2: single sample, no interval
    assert out[2]["n_resets"] == 0 and out[2]["total_increase"] == 0.0
    # key 3 ordered 10, 4(reset), 6, 7: increase 4 + 2 + 1 = 7, one reset
    assert out[3]["n_resets"] == 1 and out[3]["total_increase"] == 7.0


def test_gap_fill_grid_is_epoch_aligned(spark):
    # samples at ts 250 and 410 with step 100 -> buckets 200..400, not 250..
    df = spark.createDataFrame(
        [(1, 250, 1.0), (1, 410, 2.0)], "k bigint, ts bigint, value double"
    )
    got = sorted(
        r["bucket_us"] for r in gap_fill(df, "k", "ts", "value", 100).collect()
    )
    assert got == [200, 300, 400]


def test_rolling_active_entities_counts_trailing_window(spark):
    from observation_lakehouse_spark.operators.timeseries import (
        rolling_active_entities,
    )

    # buckets of 10us, window of 3 buckets; users: a@0, b@10, a@40
    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (10, "b"), (40, "a")], "ts bigint, u string"
    )
    out = {
        r["bucket_us"]: r["n_active"]
        for r in rolling_active_entities(df, "u", "ts", 3, 10).collect()
    }
    # window ends: 0:{a} 10:{a,b} 20:{a,b} 30:{b} 40:{a}; no bucket past 40
    assert out == {0: 1, 10: 2, 20: 2, 30: 1, 40: 1}


def test_dup_span_stats_flags_shared_windows(spark):
    from observation_lakehouse_spark.operators.dedup import dup_span_stats

    shared = "one two three four"  # 4-token window shared verbatim
    rows = [
        (1, shared + " alpha beta"),
        (2, shared + " gamma delta"),
        (3, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_stats(df, "text", "doc_id", ngram=4).collect()}
    # docs 1/2: 3 windows each, exactly the leading shared one duplicated
    assert out[1]["n_grams"] == 3 and out[1]["n_dup_grams"] == 1
    assert out[2]["n_grams"] == 3 and out[2]["n_dup_grams"] == 1
    assert out[3]["n_dup_grams"] == 0
    assert out[1]["dup_ratio"] == round(1 / 3, 6)


def test_gap_fill_linear_interpolates_between_anchors(spark, samples):
    # key 1 buckets: 0 (mean 3.0), 100, 200 empty, 300 (9.0): line 3 -> 9
    out = {
        (r["k"], r["bucket_us"]): (r["value"], r["filled"])
        for r in gap_fill(samples, "k", "ts", "value", STEP, strategy="linear").collect()
    }
    assert out[(1, 0)] == (3.0, False)
    assert out[(1, 100)] == (5.0, True)   # 3 + 6 * 1/3
    assert out[(1, 200)] == (7.0, True)   # 3 + 6 * 2/3
    assert out[(1, 300)] == (9.0, False)


def test_gap_fill_rejects_unknown_strategy(spark, samples):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gap_fill(samples, "k", "ts", "value", STEP, strategy="cubic")


def test_rolling_active_approx_tracks_exact(spark):
    """The HLL scale path (exact=False) must track the exact sliding
    distinct within its configured relative error on every window."""
    from observation_lakehouse_spark.operators.timeseries import (
        rolling_active_entities,
    )

    rows = [(t * 3 + u, t, f"u{u % 97}") for t in range(30) for u in range(40)]
    df = spark.createDataFrame(
        [(ts, e) for _, ts, e in rows], "ts bigint, e string"
    )
    exact = {
        r["bucket_us"]: r["n_active"]
        for r in rolling_active_entities(df, "e", "ts", 7, 5).collect()
    }
    approx = {
        r["bucket_us"]: r["n_active"]
        for r in rolling_active_entities(df, "e", "ts", 7, 5, exact=False).collect()
    }
    assert set(exact) == set(approx)
    for b, n in exact.items():
        assert abs(approx[b] - n) <= max(2, 0.15 * n)  # 3x rsd margin


def test_m4_downsample_four_anchors(spark):
    from observation_lakehouse_spark.operators.timeseries import m4_downsample

    rows = [
        ("k", 10, 5.0),   # first (min ts)
        ("k", 20, 1.0),   # min
        ("k", 30, 9.0),   # max
        ("k", 40, 7.0),   # last (max ts)
        ("k", 110, 3.0),  # second bucket, single sample = all four anchors
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    got = {
        r.bucket_us: (r.v_min, r.v_max, r.v_first, r.v_last, r.n_samples)
        for r in m4_downsample(df, "k", "ts", "v", 100).collect()
    }
    assert got[0] == (1.0, 9.0, 5.0, 7.0, 4)
    assert got[100] == (3.0, 3.0, 3.0, 3.0, 1)


def test_m4_downsample_tie_breaks_on_value(spark):
    from observation_lakehouse_spark.operators.timeseries import m4_downsample

    # two samples at the SAME ts: first = smaller value, last = larger value
    rows = [("k", 10, 8.0), ("k", 10, 2.0)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    r = m4_downsample(df, "k", "ts", "v", 100).collect()[0]
    assert (r.v_first, r.v_last) == (2.0, 8.0)


def test_seasonal_decompose_recovers_planted_seasonality(spark):
    from observation_lakehouse_spark.operators.timeseries import seasonal_decompose

    # value = 100 + 10*phase (pure weekly pattern, no trend slope): trend
    # (7-bucket centered MA) is the constant phase-mean; the seasonal
    # component must recover the planted phase offsets re-centered to ~0
    period, n = 7, 28
    rows = [("k", b * 1000, float(100 + 10 * (b % period))) for b in range(n)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = seasonal_decompose(df, "k", "ts", "v", 1000, period=period).collect()
    by_bucket = {r.bucket_us // 1000: r for r in out}
    assert len(by_bucket) == n
    # edges: first/last half-window rows have NULL trend
    assert by_bucket[0].trend_micro is None
    assert by_bucket[n - 1].trend_micro is None
    mid = by_bucket[10]
    # centered MA over one full period of 100 + 10*phase = 100 + 10*3 = 130
    assert mid.trend_micro == 130_000_000
    # seasonal at phase p: 10*(p-3) in micro (recentered around the mean)
    for b in range(3, n - 3):
        r = by_bucket[b]
        assert r.seasonal_micro == 10_000_000 * ((b % period) - 3), (b, r)
        assert r.residual_micro == 0, (b, r)
    # decomposition identity where complete
    for r in out:
        if r.trend_micro is not None and r.seasonal_micro is not None:
            assert r.value_micro == r.trend_micro + r.seasonal_micro + r.residual_micro


def test_seasonal_decompose_rejects_even_period(spark):
    import pytest

    from observation_lakehouse_spark.operators.timeseries import seasonal_decompose

    df = spark.createDataFrame([("k", 0, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError):
        seasonal_decompose(df, "k", "ts", "v", 1000, period=4)


def test_cusum_drift_detects_level_shift(spark):
    from observation_lakehouse_spark.operators.timeseries import cusum_drift

    # level 10 for 10 buckets, then a shift to 20: CUSUM must stay near 0
    # before the shift and accumulate past it; a z-score-style global view
    # would dilute a late small shift — CUSUM's point
    rows = [("k", b * 1000, 10.0) for b in range(10)] + [
        ("k", b * 1000, 20.0) for b in range(10, 20)
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {
        r.bucket_us // 1000: (r.cusum_micro, r.drifted)
        for r in cusum_drift(df, "k", "ts", "v", 1000, 8_000_000).collect()
    }
    # ref = mean of means = 15; pre-shift dev = -5e6/bucket -> cusum pinned 0
    assert all(out[b][0] == 0 for b in range(10))
    # post-shift dev = +5e6/bucket -> cusum ramps 5e6, 10e6, ...
    assert out[10][0] == 5_000_000 and out[11][0] == 10_000_000
    assert not out[10][1] and out[11][1]  # crosses the 8e6 threshold at b=11
    assert out[19][0] == 50_000_000 and out[19][1]


def test_cusum_initial_positive_run_measures_from_zero(spark):
    from observation_lakehouse_spark.operators.timeseries import cusum_drift

    # first deviations are positive: the virtual s_0 = 0 floor must apply
    # (min over (0, cum...)), not the first cum value
    rows = [("k", 0, 30.0), ("k", 1000, 30.0), ("k", 2000, 0.0), ("k", 3000, 0.0)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {
        r.bucket_us // 1000: r.cusum_micro
        for r in cusum_drift(df, "k", "ts", "v", 1000, 10**12).collect()
    }
    # ref = 15; devs: +15, +15, -15, -15 (micro x1e6)
    assert out[0] == 15_000_000  # NOT 0 — measured from the s_0=0 floor
    assert out[1] == 30_000_000
    assert out[3] == 0


# -- autocorrelation (r9) -----------------------------------------------------


def test_acf_alternating_series_is_minus_one_at_lag1(spark):
    from observation_lakehouse_spark.operators.timeseries import autocorrelation

    rows = [("k", i, float(1 if i % 2 == 0 else -1)) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, t int, value double")
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "key", ["t"], "value", lags=(1, 2)).collect()
    }
    assert got[1] == -1.0
    assert got[2] == 1.0


def test_acf_constant_series_is_null(spark):
    from observation_lakehouse_spark.operators.timeseries import autocorrelation

    df = spark.createDataFrame(
        [("k", i, 5.0) for i in range(10)], "key string, t int, value double"
    )
    rows = autocorrelation(df, "key", ["t"], "value", lags=(1,)).collect()
    assert rows[0]["acf"] is None
    assert rows[0]["n_pairs"] == 9


def test_acf_matches_numpy_pairwise_corr(spark):
    import numpy as np

    from observation_lakehouse_spark.operators.timeseries import autocorrelation

    rng = np.random.RandomState(5)
    # 2-decimal values (the decimal co-moment contract)
    xs = np.round(rng.randn(60).cumsum(), 2)
    df = spark.createDataFrame(
        [("k", i, float(x)) for i, x in enumerate(xs)],
        "key string, t int, value double",
    )
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "key", ["t"], "value", lags=(1, 3)).collect()
    }
    for k in (1, 3):
        ref = np.corrcoef(xs[k:], xs[:-k])[0, 1]
        assert abs(got[k] - ref) < 1e-6


def test_acf_validates_lags(spark):
    import pytest as _pytest

    from observation_lakehouse_spark.operators.timeseries import autocorrelation

    df = spark.createDataFrame([("k", 1, 1.0)], "key string, t int, value double")
    with _pytest.raises(ValueError):
        autocorrelation(df, "key", ["t"], "value", lags=())
    with _pytest.raises(ValueError):
        autocorrelation(df, "key", ["t"], "value", lags=(0,))
