"""Funnel / cohort retention / multi-resolution rollup (operators/behavior.py)."""

from __future__ import annotations

import pytest

from observation_lakehouse_spark.operators.behavior import (
    US_PER_DAY,
    US_PER_HOUR,
    cohort_retention,
    funnel,
    multires_rollup,
)

STAGES = ["signup", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long, event_type string, value double")


def _funnel_counts(spark, rows):
    out = funnel(_ev(spark, rows), STAGES)
    return {r["stage"]: r["n_users"] for r in out.collect()}


def test_funnel_full_conversion(spark):
    rows = [(1, 10, "signup", 0.0), (1, 20, "click", 0.0), (1, 30, "purchase", 0.0)]
    assert _funnel_counts(spark, rows) == {"signup": 1, "click": 1, "purchase": 1}


def test_funnel_order_matters(spark):
    # purchase BEFORE the click → user reaches click but not purchase
    rows = [(1, 10, "signup", 0.0), (1, 30, "click", 0.0), (1, 20, "purchase", 0.0)]
    assert _funnel_counts(spark, rows) == {"signup": 1, "click": 1, "purchase": 0}


def test_funnel_global_min_is_not_enough(spark):
    # The user's EARLIEST click precedes signup, but a later click still
    # qualifies — the case a per-stage global MIN chain gets wrong.
    rows = [
        (1, 5, "click", 0.0),
        (1, 10, "signup", 0.0),
        (1, 20, "click", 0.0),
        (1, 30, "purchase", 0.0),
    ]
    assert _funnel_counts(spark, rows) == {"signup": 1, "click": 1, "purchase": 1}


def test_funnel_equal_timestamps_progress(spark):
    rows = [(1, 10, "signup", 0.0), (1, 10, "click", 0.0), (1, 10, "purchase", 0.0)]
    assert _funnel_counts(spark, rows) == {"signup": 1, "click": 1, "purchase": 1}


def test_funnel_counts_are_cumulative_depths(spark):
    rows = [
        (1, 10, "signup", 0.0),  # depth 1
        (2, 10, "signup", 0.0), (2, 20, "click", 0.0),  # depth 2
        (3, 10, "click", 0.0),  # never signed up → depth 0
    ]
    assert _funnel_counts(spark, rows) == {"signup": 2, "click": 1, "purchase": 0}


def test_funnel_needs_two_stages(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, []), ["signup"])


def test_cohort_retention_offsets(spark):
    d = US_PER_DAY
    rows = [
        (1, 0 * d, "view", 0.0),          # cohort week 0, offset 0
        (1, 8 * d, "view", 0.0),          # offset 1
        (2, 1 * d, "view", 0.0),          # same epoch-week cohort, offset 0
        (3, 40 * d, "view", 0.0),         # cohort week 5, offset 0
        (3, 100 * d, "view", 0.0),        # offset 8 > max_weeks → dropped
    ]
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows), max_weeks=4).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (5, 0): 1}


def test_multires_rollup_grains_and_sums(spark):
    h = US_PER_HOUR
    rows = [
        (1, 0 * h, "click", 1.0),
        (1, 0 * h + 5, "click", 2.0),
        (1, 1 * h, "click", 4.0),
        (1, 25 * h, "view", 8.0),  # next day
    ]
    out = multires_rollup(_ev(spark, rows)).collect()
    cells = {(r["grain"], r["day"], r["hour"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in out}
    assert cells[("hour", 0, 0, "click")] == (2, 3.0)
    assert cells[("hour", 0, 1, "click")] == (1, 4.0)
    assert cells[("hour", 1, 1, "view")] == (1, 8.0)
    assert cells[("day", 0, None, "click")] == (3, 7.0)
    assert cells[("day", 1, None, "view")] == (1, 8.0)
    assert cells[("all", None, None, "click")] == (3, 7.0)
    assert cells[("all", None, None, "view")] == (1, 8.0)
    # one Expand + one aggregate: exactly 3 grains, no duplicate cells
    assert len(out) == len(cells) == 7


def test_frequent_paths_counts_sliding_windows(spark):
    from observation_lakehouse_spark.operators.behavior import frequent_paths

    rows = [
        # user 1: a b a b a  -> a>b>a x2, b>a>b x1
        (1, 1, 1, "a"), (2, 2, 1, "b"), (3, 3, 1, "a"), (4, 4, 1, "b"), (5, 5, 1, "a"),
        # user 2: a b a      -> a>b>a x1
        (6, 1, 2, "a"), (7, 2, 2, "b"), (8, 3, 2, "a"),
        # user 3: too short for depth 3
        (9, 1, 3, "a"), (10, 2, 3, "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts long, user_id long, event_type string")
    got = {(r.path, r.n_occurrences, r.n_users) for r in frequent_paths(df).collect()}
    assert got == {("a>b>a", 3, 2), ("b>a>b", 1, 1)}


def test_frequent_paths_tiebreak_and_k(spark):
    from observation_lakehouse_spark.operators.behavior import frequent_paths

    rows = [
        (1, 1, 1, "c"), (2, 2, 1, "b"), (3, 3, 1, "a"),
        (4, 1, 2, "a"), (5, 2, 2, "b"), (6, 3, 2, "c"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts long, user_id long, event_type string")
    out = frequent_paths(df, k=1).collect()
    # equal counts -> lexicographically smaller path wins the k cut
    assert [(r.path, r.n_occurrences) for r in out] == [("a>b>c", 1)]


def test_frequent_paths_never_crosses_users(spark):
    from observation_lakehouse_spark.operators.behavior import frequent_paths

    rows = [(1, 1, 1, "a"), (2, 2, 1, "b"), (3, 3, 2, "c")]
    df = spark.createDataFrame(rows, "event_id long, ts long, user_id long, event_type string")
    assert frequent_paths(df).count() == 0


def _attr(spark, rows, **kw):
    from observation_lakehouse_spark.operators.behavior import last_touch_attribution

    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    return {
        r.touch_type: (r.n_conversions, r.revenue)
        for r in last_touch_attribution(df, window_us=100, **kw).collect()
    }


def test_attribution_credits_most_recent_touch(spark):
    rows = [
        (1, 10, 1, "view", 0.0),
        (2, 20, 1, "click", 0.0),
        (3, 30, 1, "purchase", 50.0),   # last touch = click@20
        (4, 500, 1, "purchase", 10.0),  # nothing within 100us -> unattributed
    ]
    assert _attr(spark, rows) == {
        "click": (1, 50.0),
        "unattributed": (1, 10.0),
    }


def test_attribution_prior_purchase_is_not_a_touch(spark):
    rows = [
        (1, 10, 1, "purchase", 5.0),    # unattributed (no prior)
        (2, 20, 1, "purchase", 7.0),    # prior event is a purchase -> not a touch
    ]
    assert _attr(spark, rows) == {"unattributed": (2, 12.0)}


def test_attribution_ts_tie_breaks_on_type_not_row_order(spark):
    rows = [
        (1, 10, 1, "click", 0.0),
        (2, 10, 1, "view", 0.0),        # same ts: 'view' > 'click' lexicographically
        (3, 30, 1, "purchase", 9.0),
    ]
    assert _attr(spark, rows) == {"view": (1, 9.0)}


def test_attribution_equal_ts_touch_excluded_by_range_frame(spark):
    # a touch at EXACTLY the conversion ts is not "before" it (frame ends
    # at 1 PRECEDING on the value axis)
    rows = [(1, 30, 1, "click", 0.0), (2, 30, 1, "purchase", 4.0)]
    assert _attr(spark, rows) == {"unattributed": (1, 4.0)}


def test_mad_anomalies_flags_only_outliers(spark):
    from observation_lakehouse_spark.operators.behavior import mad_anomalies

    # tight cluster around 10 plus one wild point; a z-score with the
    # outlier included would inflate sigma — MAD must still flag it
    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(20)] + [(99, "a", 1000.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mad_anomalies(df, "event_type", "value", "event_id", k_times_100=300).collect()
    assert [r.event_id for r in got] == [99]
    r = got[0]
    # median of the 21 values = 10.1 -> med_x2 = 20_200_000 micro
    assert r.med_x2_micro == 20_200_000
    assert r.value_micro == 1_000_000_000


def test_mad_anomalies_constant_series_flags_any_deviation(spark):
    from observation_lakehouse_spark.operators.behavior import mad_anomalies

    # constant series: MAD = 0, so ANY deviation is an outlier (the
    # documented degenerate behavior of the MAD rule)
    rows = [(i, "k", 5.0) for i in range(10)] + [(50, "k", 5.001)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mad_anomalies(df, "event_type", "value", "event_id").collect()
    assert [r.event_id for r in got] == [50]


def test_rfm_segments_scores_and_ties(spark):
    from observation_lakehouse_spark.operators.behavior import rfm_segments

    # 5 users, clearly ordered metrics; user 5 is best on all three
    rows = []
    for u in range(1, 6):
        for k in range(u):  # frequency = u
            rows.append((u, 1000 * u + k, float(10 * u)))
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = {r.user_id: r for r in rfm_segments(df, "user_id", "ts", "value", n_tiles=5).collect()}
    assert got[5].segment == "555" and got[1].segment == "111"
    assert got[3].frequency == 3 and got[3].monetary_micro == 3 * 30_000_000
    # ntile over 5 rows with 5 tiles: strictly ordered metrics -> scores 1..5
    assert [got[u].m_score for u in range(1, 6)] == [1, 2, 3, 4, 5]


def test_ntile_from_rank_matches_window_ntile_all_shapes(spark):
    """_ntile_from_rank must be bit-identical to F.ntile over the same total
    order for every (N, n_tiles) shape class: N % n == 0, N % n != 0, and
    N < n (empty tail buckets)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.operators.behavior import _ntile_from_rank

    for n_rows, n_tiles in [(10, 5), (11, 5), (7, 5), (3, 5), (1, 2), (100, 7)]:
        df = spark.range(1, n_rows + 1).select(F.col("id").alias("v"))
        w = Window.orderBy("v")
        expect = {
            r["v"]: r["t"]
            for r in df.withColumn("t", F.ntile(n_tiles).over(w)).collect()
        }
        got = {
            r["v"]: r["t"]
            for r in df.withColumn(
                "t", _ntile_from_rank(F.col("v"), n_tiles, n_rows)
            ).collect()
        }
        assert got == expect, (n_rows, n_tiles)
