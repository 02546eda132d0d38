"""Stream-stream interval join: real-stream run + batch-mode semantics."""

from __future__ import annotations

import datetime as dt

from observation_lakehouse_spark.streaming.joins import stream_stream_interval_join

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)

LEFT = [(1, _ts(0), "click"), (1, _ts(30), "click"), (2, _ts(0), "view")]
RIGHT = [
    (1, _ts(5), "purchase"),     # joins left@0 (within 10m), not left@30
    (1, _ts(36), "purchase"),    # joins left@30
    (2, _ts(20), "purchase"),    # outside 10m of left@0 → no match
    (3, _ts(1), "purchase"),     # no left key
]
SCHEMA = "user_id long, ts timestamp, kind string"


def _expected():
    return {(1, _ts(0), _ts(5)), (1, _ts(30), _ts(36))}


def test_batch_semantics(spark):
    l = spark.createDataFrame(LEFT, SCHEMA)
    r = spark.createDataFrame(RIGHT, SCHEMA)
    out = stream_stream_interval_join(l, r, key="user_id")
    got = {(x["user_id"], x["ts"], x["r_ts"]) for x in out.collect()}
    assert got == _expected()


def test_streaming_run(spark, tmp_path):
    for name, rows in (("l", LEFT), ("r", RIGHT)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
    ls = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "l"))
    rs = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "r"))
    joined = stream_stream_interval_join(ls, rs, key="user_id")
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (x["user_id"], x["ts"], x["r_ts"])
        for x in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == _expected()


def test_stream_static_enrich(spark, tmp_path):
    """Stateless stream-static join: every micro-batch row is enriched from
    the broadcast dimension snapshot, unmatched keys NULL-fill on left."""
    import datetime as dt

    from observation_lakehouse_spark.streaming.joins import stream_static_enrich

    landing = tmp_path / "enrich-landing"
    out = tmp_path / "enrich-out"
    ckpt = tmp_path / "enrich-ckpt"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(1, 10, t0), (2, 20, t0), (3, 99, t0)],
        "event_id long, user_id long, event_time timestamp",
    ).write.parquet(str(landing))
    dim = spark.createDataFrame([(10, "gold"), (20, "basic")], "user_id long, tier string")

    stream = spark.readStream.schema(
        "event_id long, user_id long, event_time timestamp"
    ).parquet(str(landing))
    q = (
        stream_static_enrich(stream, dim, key="user_id")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {1: "gold", 2: "basic", 3: None}


def test_stream_static_enrich_rejects_stream_dropping_joins(spark):
    from observation_lakehouse_spark.streaming.joins import stream_static_enrich

    import pytest as _pytest

    dim = spark.createDataFrame([(1, "x")], "user_id long, v string")
    with _pytest.raises(ValueError, match="preserve the stream side"):
        stream_static_enrich(dim, dim, key="user_id", how="right")
