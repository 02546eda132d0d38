"""Streaming Brier monitor (streaming/brier.py): the derived decomposition
must equal brier_decomposition bit-for-bit over the same delivered rows,
survive checkpoint replay, and fold late files incrementally."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.brier import StreamingBrierMonitor

SCHEMA = "event_id long, p double, y int"

ROWS1 = [(i, ((i * 13) % 100) / 100.0, 1 if (i * 7) % 3 == 0 else 0) for i in range(300)]
ROWS2 = [(500 + i, ((i * 29) % 100) / 100.0, i % 2) for i in range(200)]
ROWS3 = [(900 + i, 1.0, 1) for i in range(10)]  # clamped top edge, late


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch(spark, rows):
    from observation_lakehouse_spark.operators.evaluation import brier_decomposition

    df = spark.createDataFrame(rows, SCHEMA)
    return [tuple(r) for r in brier_decomposition(df, "p", "y", n_bins=10).collect()]


def test_stream_brier_matches_batch_and_replays_safely(spark, tmp_path):
    mon = StreamingBrierMonitor(spark, str(tmp_path / "state"), n_bins=10)
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2
    )

    # exactly-once: replay must not shift any component
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late file folds in; state stays O(n_bins)
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2 + ROWS3
    )
    assert mon.bins().count() <= 10
