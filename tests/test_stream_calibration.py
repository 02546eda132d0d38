"""Streaming calibration monitor (streaming/calibration.py): the derived
report must equal calibration_report bit-for-bit over the same delivered
rows, survive checkpoint replay, and fold late files incrementally."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.calibration import (
    StreamingCalibrationMonitor,
)

SCHEMA = "event_id long, p double, y int"

ROWS1 = [(i, ((i * 13) % 100) / 100.0, 1 if (i * 7) % 3 == 0 else 0) for i in range(300)]
ROWS2 = [(500 + i, ((i * 29) % 100) / 100.0, i % 2) for i in range(200)]
ROWS3 = [(900 + i, 1.0, 1) for i in range(10)]  # clamped top edge, late


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_report(spark, rows):
    from observation_lakehouse_spark.operators.evaluation import calibration_report

    df = spark.createDataFrame(rows, SCHEMA)
    return [tuple(r) for r in calibration_report(df, "p", "y", n_bins=10).collect()]


def test_stream_report_matches_batch_and_replays_safely(spark, tmp_path):
    mon = StreamingCalibrationMonitor(spark, str(tmp_path / "state"), n_bins=10)
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    assert [tuple(r) for r in mon.report().collect()] == _batch_report(
        spark, ROWS1 + ROWS2
    )

    # exactly-once: replay must not shift any mean/rate
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late file folds in; clamped p=1.0 rows land in the last bin
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    got = [tuple(r) for r in mon.report().collect()]
    assert got == _batch_report(spark, ROWS1 + ROWS2 + ROWS3)
    assert mon.bins().count() <= 10
