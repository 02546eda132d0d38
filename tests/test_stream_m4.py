"""Streaming M4 maintainer (streaming/m4.py): anchors must equal the batch
m4_downsample twin over the same delivered rows, survive checkpoint replay
without double-counting, and fold late files incrementally (min/max/struct
extremes are mergeable; n_samples relies on the idempotency ledger)."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.m4 import StreamingM4

SCHEMA = "event_id long, event_type string, ts long, value double"
BUCKET = 1000

ROWS1 = [(i, "click", 10 * i, float((i * 7) % 23)) for i in range(200)]
ROWS2 = [(500 + i, "view", 10 * i + 5, float((i * 3) % 17)) for i in range(100)]
ROWS3 = [(900 + i, "click", 10 * i + 2, 100.0 + i) for i in range(10)]  # late


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch(spark, rows):
    from observation_lakehouse_spark.operators.timeseries import m4_downsample

    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.event_type, r.bucket_us): (
            r.v_min, r.v_max, r.v_first, r.v_last, r.n_samples
        )
        for r in m4_downsample(df, "event_type", "ts", "value", BUCKET).collect()
    }


def test_stream_m4_matches_batch_and_replays_safely(spark, tmp_path):
    mon = StreamingM4(
        spark, str(tmp_path / "state"), ts_col="ts", bucket_us=BUCKET
    )
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    got = {
        (r.k, r.bucket_us): (r.v_min, r.v_max, r.v_first, r.v_last, r.n_samples)
        for r in mon.anchors().collect()
    }
    assert got == _batch(spark, ROWS1 + ROWS2)

    # exactly-once: replay over the same checkpoint must not inflate counts
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late file folds in: new maxima/last anchors move, counts add once
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    got3 = {
        (r.k, r.bucket_us): (r.v_min, r.v_max, r.v_first, r.v_last, r.n_samples)
        for r in mon.anchors().collect()
    }
    assert got3 == _batch(spark, ROWS1 + ROWS2 + ROWS3)
    # the late rows (ts 2..92 -> bucket 0) raised that bucket's max
    assert got3[("click", 0)][1] >= 100.0
