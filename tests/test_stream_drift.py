"""Streaming PSI monitor (streaming/drift.py): the derived report must
equal psi_drift(ref, delivered rows) bit-for-bit, survive checkpoint
replay, and fold late files incrementally."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.drift import StreamingPsiMonitor

SCHEMA = "event_id long, value double"

REF = [(i, ((i * 17) % 500) / 1.0) for i in range(400)]
ROWS1 = [(i, ((i * 13) % 500) / 1.0) for i in range(300)]
ROWS2 = [(500 + i, 450.0 + (i % 50)) for i in range(200)]  # shifted tail mass
ROWS3 = [(900 + i, 600.0) for i in range(10)]  # above hi: clamps to last bin


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch(spark, rows):
    from observation_lakehouse_spark.operators.audit import psi_drift

    ref = spark.createDataFrame(REF, SCHEMA)
    cur = spark.createDataFrame(rows, SCHEMA)
    return [
        tuple(r)
        for r in psi_drift(ref, cur, "value", 0.0, 500.0, n_bins=10).collect()
    ]


def test_stream_psi_matches_batch_and_replays_safely(spark, tmp_path):
    ref = spark.createDataFrame(REF, SCHEMA)
    mon = StreamingPsiMonitor(
        spark, str(tmp_path / "state"), ref, "value", 0.0, 500.0, n_bins=10
    )
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2
    )
    # the shifted tail mass registers as positive drift
    assert sum(r.psi_contrib_micro for r in mon.report().collect()) > 50_000

    # exactly-once: replay must not inflate any bin
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late + out-of-range rows clamp into the last bin, still batch-exact
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2 + ROWS3
    )
    assert mon.mv.read().count() <= 10
