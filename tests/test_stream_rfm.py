"""Streaming RFM maintainer (streaming/rfm.py): derived segments must equal
the batch rfm_segments over the same delivered rows, survive checkpoint
replay (frequency/monetary are NOT idempotent — the ledger must hold), and
fold late events incrementally (recency moves, counts add once)."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.rfm import StreamingRFM

SCHEMA = "event_id long, user_id long, ts long, value double"

ROWS1 = [(i, i % 20, 1000 * i, float((i * 7) % 50)) for i in range(300)]
ROWS2 = [(500 + i, i % 30, 1000 * (500 + i), float((i * 3) % 40)) for i in range(200)]
ROWS3 = [(900 + i, 5, 10_000_000 + i, 99.5) for i in range(5)]  # late, hot user


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch(spark, rows):
    from observation_lakehouse_spark.operators.behavior import rfm_segments

    df = spark.createDataFrame(rows, SCHEMA)
    return [tuple(r) for r in rfm_segments(df, "user_id", "ts", "value").collect()]


def test_stream_segments_match_batch_and_replay_safe(spark, tmp_path):
    mon = StreamingRFM(spark, str(tmp_path / "state"))
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    assert [tuple(r) for r in mon.segments().collect()] == _batch(
        spark, ROWS1 + ROWS2
    )

    # exactly-once: replay must not inflate frequency/monetary
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late events: recency advances, frequency adds once, segments re-derive
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    got = [tuple(r) for r in mon.segments().collect()]
    assert got == _batch(spark, ROWS1 + ROWS2 + ROWS3)
    hot = {r.user_id: r for r in mon.profiles().collect()}[5]
    assert hot.recency_ts == 10_000_004
