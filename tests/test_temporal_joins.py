"""As-of and range joins (custom operators — Spark lacks both natively)."""

from __future__ import annotations

from observation_lakehouse_spark.operators.joins import asof_join, range_join


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 20, "t2"), ("A", 5, "t0"), ("B", 15, "t3")],
        "sym string, ts long, trade_id string",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 18, 102.0), ("B", 99, 200.0)],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, key="sym", left_ts="ts", right_ts="ts",
            value_cols=["px"],
        ).collect()
    }
    assert out == {
        "t0": None,     # nothing at or before ts=5
        "t1": 101.0,    # ts-equal quote matches (<= semantics)
        "t2": 102.0,    # most recent, not first
        "t3": None,     # B's only quote is later
    }


def test_asof_forward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, key="sym", left_ts="ts", right_ts="ts",
            value_cols=["px"], direction="forward",
        ).collect()
    }
    assert out == {"t0": 100.0, "t1": 101.0, "t2": None, "t3": 200.0}


def test_asof_preserves_left_columns_and_rows(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px", "ts"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "ts", "trade_id", "asof_px", "asof_ts"}


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 25), (4, 250)], "pid int, t long"
    )
    intervals = spark.createDataFrame(
        [("i1", 0, 10), ("i2", 10, 20), ("i3", 0, 300)], "iid string, s long, e long"
    )
    out = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "t", "s", "e", bucket_width=10).collect()
    )
    assert out == [
        (1, "i1"), (1, "i3"),
        (2, "i2"), (2, "i3"),
        (3, "i3"),
        (4, "i3"),
    ]


def test_range_join_no_cross_product_plan(spark):
    from observation_lakehouse_spark.plans.inspect import explain_str

    points = spark.range(100).selectExpr("id as pid", "id * 3 as t")
    intervals = spark.range(10).selectExpr("id as iid", "id * 30 as s", "id * 30 + 15 as e")
    joined = range_join(points, intervals, "t", "s", "e", bucket_width=16)
    plan = explain_str(joined)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_tie_on_right_ts_is_deterministic(spark):
    """Several right rows at the same (key, ts): the match is the row with the
    greatest value tuple — stable under repartitioning, not partition-order
    luck (total-tie-break invariant)."""
    trades = spark.createDataFrame([("A", 10, "t1")], "sym string, ts long, trade_id string")
    quotes = spark.createDataFrame(
        [("A", 10, 101.0), ("A", 10, 99.0), ("A", 10, 100.5)],
        "sym string, ts long, px double",
    )
    for q in (quotes, quotes.repartition(7), quotes.repartition(1)):
        out = asof_join(trades, q, "sym", "ts", "ts", ["px"]).collect()
        assert [r["asof_px"] for r in out] == [101.0]


def test_range_join_rejects_outer(spark):
    import pytest

    points = spark.createDataFrame([(1, 5)], "pid int, t long")
    intervals = spark.createDataFrame([(1, 0, 10)], "iid int, s long, e long")
    with pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, "t", "s", "e", bucket_width=10, how="left")


def test_join_cardinality_exact_with_skew_and_nulls(spark):
    from observation_lakehouse_spark.operators.joins import join_cardinality

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (None,), (None,)], "k long"
    )
    r = join_cardinality(left, right, "k", "k").collect()[0]
    # key 1: 3x2=6 join rows; key 2 and 3 unmatched; NULLs never match
    assert (r.n_left, r.n_right) == (4, 3)
    assert (r.left_keys, r.right_keys, r.matching_keys) == (2, 2, 1)
    assert r.join_rows == 6 and r.max_key_rows == 6
    assert (r.left_null_keys, r.right_null_keys) == (1, 2)
    # ground truth: the actual inner join produces join_rows rows
    assert left.join(right, "k").count() == r.join_rows


def test_join_cardinality_no_matches(spark):
    from observation_lakehouse_spark.operators.joins import join_cardinality

    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    r = join_cardinality(left, right, "k", "k").collect()[0]
    assert r.join_rows == 0 and r.matching_keys == 0 and r.max_key_rows == 0
