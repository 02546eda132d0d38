"""Batch sessionization: semantics + plan shape + streaming-twin agreement."""

from __future__ import annotations

from observation_lakehouse_spark.operators.sessionization import sessionize_batch

# Same fixture as tests/test_stateful_streaming.py (ts in ms here).
EVENTS = [
    (1, 100, 0, 1.0), (1, 400, 1, 2.0), (1, 900, 2, 3.0),   # session 0
    (1, 6000, 3, 4.0), (1, 6500, 4, 5.0),                   # session 1 (gap 5100 > 1000)
    (2, 50, 5, 10.0), (2, 600, 6, 20.0),                    # session 0
]
SCHEMA = "user_id long, ts_us long, event_id long, value double"


def test_sessionize_batch_semantics(spark):
    df = sessionize_batch(spark.createDataFrame(EVENTS, SCHEMA), gap=1000)
    rows = {
        (r["user_id"], r["session_no"]): (
            r["session_start"], r["session_end"], r["n_events"], r["session_value"]
        )
        for r in df.collect()
    }
    assert rows == {
        (1, 0): (100, 900, 3, 6.0),
        (1, 1): (6000, 6500, 2, 9.0),
        (2, 0): (50, 600, 2, 30.0),
    }


def test_sessionize_batch_matches_streaming_twin(spark):
    """Closed-session extents must agree with streaming.stateful.sessionize's
    gap semantics: same fixture, same (start, end, n) triples."""
    df = sessionize_batch(
        spark.createDataFrame(EVENTS, SCHEMA), gap=1000, value_col=None
    )
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in df.collect()
    }
    # Streaming test expectations (tests/test_stateful_streaming.py, flush case).
    assert got == {(1, 100): (900, 3), (1, 6000): (6500, 2), (2, 50): (600, 2)}


def test_sessionize_batch_single_input_shuffle(spark):
    """One exchange below the aggregate: windows and groupBy share the
    hash partitioning on the session key."""
    df = sessionize_batch(spark.createDataFrame(EVENTS, SCHEMA), gap=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
