"""Stateful sessionization via applyInPandasWithState on a real stream.

availableNow semantics with ProcessingTimeTimeout: after the data batches,
Spark keeps running micro-batches while timed-out state remains, so a tiny
idle timeout drains every open session within one run — and a huge timeout
keeps open sessions in state, emitting only gap-closed ones.
"""

from __future__ import annotations

import pytest

from observation_lakehouse_spark.streaming.stateful import sessionize

GAP = 1000  # ms

EVENTS = [
    (1, 100), (1, 400), (1, 900),        # session A: 3 events, closed by gap
    (1, 6000), (1, 6500),                # session B: open until timeout
    (2, 50), (2, 600),                   # session C: open until timeout
]


def _run(
    spark, tmp_path, name: str, idle_timeout_ms: int, expect_rows: int, max_wait: int = 90
) -> dict:
    """Run the sessionizer on a micro-batch trigger and poll the memory sink
    until ``expect_rows`` sessions arrive (a query with pending
    ProcessingTimeTimeout state never self-terminates, so waiting on
    awaitTermination would stall)."""
    import time

    src = tmp_path / f"src_{name}"
    spark.createDataFrame(EVENTS, "user_id long, ts long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts long").parquet(str(src))
    q = (
        sessionize(stream, gap_ms=GAP, idle_timeout_ms=idle_timeout_ms)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        # No processAllAvailable(): with pending ProcessingTimeTimeout state the
        # trigger keeps firing batches and that call never returns. Poll instead.
        deadline = time.time() + max_wait
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0] >= expect_rows:
                break
            time.sleep(0.5)
        return {
            (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()


def test_gap_closed_session_only_with_long_timeout(spark, tmp_path):
    rows = _run(spark, tmp_path, "sess_long", idle_timeout_ms=3_600_000, expect_rows=1)
    assert rows == {(1, 100): (900, 3)}  # open sessions stay in state


def test_timeout_flushes_open_sessions(spark, tmp_path):
    rows = _run(spark, tmp_path, "sess_flush", idle_timeout_ms=1, expect_rows=3)
    assert rows[(1, 100)] == (900, 3)
    assert rows[(1, 6000)] == (6500, 2)
    assert rows[(2, 50)] == (600, 2)
    assert len(rows) == 3


def test_sessionize_is_pure_streaming_plan(spark, tmp_path):
    """The operator must build on a streaming frame without analysis errors
    (flatMapGroupsWithState in append mode)."""
    src = tmp_path / "plan_src"
    spark.createDataFrame(EVENTS, "user_id long, ts long").write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts long").parquet(str(src))
    df = sessionize(stream)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "session_start", "session_end", "n_events",
    ]
