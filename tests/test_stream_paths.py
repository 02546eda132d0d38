"""Streaming path census (streaming/paths.py): the maintained counts must
equal the batch frequent_paths census over the same delivered events —
INCLUDING trigrams that span micro-batch boundaries (the stored 2-event
tail) — and survive checkpoint replay without double-counting."""

from __future__ import annotations

from observation_lakehouse_spark.operators.behavior import frequent_paths
from observation_lakehouse_spark.streaming.paths import StreamingPathCensus

SCHEMA = "event_id long, ts long, user_id long, event_type string"

# user 1's sequence deliberately SPLIT across files so a>b>c spans the batch
# boundary; user 2 lives entirely in file 1
ROWS1 = [
    (1, 10, 1, "a"), (2, 20, 1, "b"),
    (10, 10, 2, "x"), (11, 20, 2, "y"), (12, 30, 2, "x"), (13, 40, 2, "y"),
]
ROWS2 = [
    (3, 30, 1, "c"), (4, 40, 1, "a"),  # completes a>b>c, then b>c>a
]
ROWS3 = [(5, 50, 1, "b")]  # completes c>a>b


def _run(spark, cen, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = cen.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_census(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.path: r.n_occurrences for r in frequent_paths(df, k=100).collect()
    }


def test_stream_census_matches_batch_across_boundaries(spark, tmp_path):
    cen = StreamingPathCensus(spark, str(tmp_path / "state"))
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, cen, landing, tmp_path / "ckpt")
    # batch 1 alone: user 2 contributes x>y>x and y>x>y; user 1 too short
    got1 = {r.path: r.n_occurrences for r in cen.census().collect()}
    assert got1 == {"x>y>x": 1, "y>x>y": 1}

    # batch 2: user 1's a>b (batch 1 tail) + c, a -> a>b>c AND b>c>a
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, cen, landing, tmp_path / "ckpt")
    got2 = {r.path: r.n_occurrences for r in cen.census().collect()}
    assert got2 == _batch_census(spark, ROWS1 + ROWS2)
    assert got2["a>b>c"] == 1  # the boundary-crossing trigram

    # replay: same checkpoint, no new files -> census unchanged
    v = cen.mv.table.latest_version()
    _run(spark, cen, landing, tmp_path / "ckpt")
    assert cen.mv.table.latest_version() == v

    # batch 3 extends the chain one more step
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, cen, landing, tmp_path / "ckpt")
    got3 = {r.path: r.n_occurrences for r in cen.census().collect()}
    assert got3 == _batch_census(spark, ROWS1 + ROWS2 + ROWS3)
    assert got3["c>a>b"] == 1
