"""Streaming attribution (streaming/attribution.py): the maintained report
must equal batch last_touch_attribution over the same delivered events —
including a touch in one batch crediting a conversion in a LATER batch —
and survive checkpoint replay without double-counting."""

from __future__ import annotations

from observation_lakehouse_spark.operators.behavior import last_touch_attribution
from observation_lakehouse_spark.streaming.attribution import StreamingAttribution

SCHEMA = "event_id long, ts long, user_id long, event_type string, value double"
WINDOW = 100

# user 1: touch in batch 1, conversion in batch 2 (cross-batch credit);
# user 2: conversion with an expired touch (outside the 100us window);
# user 3: ts-tie between two touches, then a conversion
ROWS1 = [
    (1, 10, 1, "click", 0.0),
    (2, 5, 2, "view", 0.0),
    (3, 30, 3, "click", 0.0),
    (4, 30, 3, "view", 0.0),
]
ROWS2 = [
    (5, 50, 1, "purchase", 12.5),   # credits click@10 (within 100)
    (6, 400, 2, "purchase", 7.25),  # view@5 expired -> unattributed
    (7, 60, 3, "purchase", 3.0),    # tie at ts=30 -> 'view' (lexicographic max)
]
ROWS3 = [
    (8, 55, 1, "purchase", 1.0),    # click@10 still in window (55-10 <= 100)
]


def _run(spark, attr, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = attr.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_report(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.touch_type, r.n_conversions, r.revenue)
        for r in last_touch_attribution(df, window_us=WINDOW).collect()
    }


def test_stream_attribution_matches_batch_across_batches(spark, tmp_path):
    attr = StreamingAttribution(spark, str(tmp_path / "state"), window_us=WINDOW)
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, attr, landing, tmp_path / "ckpt")

    got = {
        (r.touch_type, r.n_conversions, r.revenue) for r in attr.report().collect()
    }
    assert got == _batch_report(spark, ROWS1 + ROWS2)
    assert ("click", 1, 12.5) in got      # cross-batch credit
    assert ("unattributed", 1, 7.25) in got
    assert ("view", 1, 3.0) in got        # ts-tie broke on type like batch MAX

    # replay safety
    v = attr.mv.table.latest_version()
    _run(spark, attr, landing, tmp_path / "ckpt")
    assert attr.mv.table.latest_version() == v

    # late batch: another conversion against the SAME stored touch
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, attr, landing, tmp_path / "ckpt")
    got3 = {
        (r.touch_type, r.n_conversions, r.revenue) for r in attr.report().collect()
    }
    assert got3 == _batch_report(spark, ROWS1 + ROWS2 + ROWS3)
    assert ("click", 2, 13.5) in got3
