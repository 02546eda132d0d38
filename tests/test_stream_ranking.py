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


def test_repeated_reports_stay_actionable_and_release_snapshot(spark, tmp_path):
    """r11 ADVICE: report N must stay collectable AFTER report N+1 runs
    (the old scheme released N's state snapshot on the next call, poisoning
    a still-held frame), and the state snapshot a report checkpoints must
    be released before report() returns — nothing accumulates across calls
    on a long-lived monitor."""
    from observation_lakehouse_spark.streaming.ranking import StreamingArenaRatings

    mon = StreamingArenaRatings(spark, str(tmp_path / "state_rel"))
    landing = tmp_path / "landing_rel"
    spark.createDataFrame(ROWS1, BATTLE_SCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(BATTLE_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt_rel"), available_now=True)
    q.awaitTermination(120)

    rep1 = mon.report(2)
    first = [tuple(r) for r in rep1.collect()]
    # the returned report is a LOCAL table — no checkpoint lineage to
    # poison or accumulate (the state snapshot is released inside report)
    assert "LogicalRDD" in rep1._jdf.queryExecution().analyzed().toString() or (
        "LocalRelation" in rep1._jdf.queryExecution().analyzed().toString()
    )
    rep2 = mon.report(2)
    assert [tuple(r) for r in rep2.collect()] == first
    # the ADVICE regression: report 1 is STILL actionable after report 2
    assert [tuple(r) for r in rep1.collect()] == first
