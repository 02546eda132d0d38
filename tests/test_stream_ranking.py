"""StreamingArenaRatings: live Bradley–Terry over an exactly-once
pair-count state (streaming/ranking.py)."""

from __future__ import annotations

import pytest

BATTLE_SCHEMA = "winner_id string, loser_id string"
ROWS1 = [("m1", "m2")] * 6 + [("m2", "m1")] * 2 + [("m1", "m3")] * 4
ROWS2 = [("m3", "m2")] * 3 + [("m2", "m3")] * 3 + [("m1", "m1")] + [(None, "m2")]


def _batch(spark, rows, n_rounds=3):
    from observation_lakehouse_spark.operators.ranking import bradley_terry

    df = spark.createDataFrame(rows, BATTLE_SCHEMA)
    return [tuple(r) for r in bradley_terry(df, n_rounds=n_rounds).collect()]


def test_stream_ratings_match_batch_and_replays(spark, tmp_path):
    from observation_lakehouse_spark.streaming.ranking import StreamingArenaRatings

    mon = StreamingArenaRatings(spark, str(tmp_path / "state"))
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, BATTLE_SCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert [tuple(r) for r in mon.report(3).collect()] == _batch(spark, ROWS1)

    # second batch folds in; self-battles and NULLs are dropped upstream
    spark.createDataFrame(ROWS2, BATTLE_SCHEMA).write.parquet(str(landing / "f2"))
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    live = [tuple(r) for r in mon.report(3).collect()]
    assert live == _batch(spark, ROWS1 + ROWS2)

    # replaying the same files through the same checkpoint is a no-op
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert [tuple(r) for r in mon.report(3).collect()] == live


def test_stream_ratings_bounds_state(spark, tmp_path):
    from observation_lakehouse_spark.streaming.ranking import StreamingArenaRatings

    mon = StreamingArenaRatings(spark, str(tmp_path / "state"), max_pairs=3)
    landing = tmp_path / "landing"
    rows = [(f"i{k}", f"i{k + 1}") for k in range(6)]
    spark.createDataFrame(rows, BATTLE_SCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="max_pairs"):
        mon.report()
    with pytest.raises(ValueError):
        StreamingArenaRatings(spark, str(tmp_path / "s2"), max_pairs=0)


def test_repeated_reports_release_previous_checkpoint(spark, tmp_path):
    """r11 (r10 ADVICE): report() must not accumulate checkpoint RDD
    blocks across calls on a long-lived monitor — each report releases
    the previous one's eagerly-checkpointed state snapshot."""
    from observation_lakehouse_spark.streaming.ranking import StreamingArenaRatings

    mon = StreamingArenaRatings(spark, str(tmp_path / "state_rel"))
    landing = tmp_path / "landing_rel"
    spark.createDataFrame(ROWS1, BATTLE_SCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt_rel"), available_now=True)
    q.awaitTermination(120)

    jsc = spark.sparkContext._jsc.sc()
    first = [tuple(r) for r in mon.report(2).collect()]
    ckpt1 = mon._report_ckpt
    plan1 = ckpt1._jdf.queryExecution().analyzed()
    rdd1_id = plan1.rdd().id()
    assert jsc.getPersistentRDDs().contains(rdd1_id)
    # a second report releases the first snapshot and still reports right
    assert [tuple(r) for r in mon.report(2).collect()] == first
    assert not jsc.getPersistentRDDs().contains(rdd1_id)
