"""Streaming CMS (streaming/cms.py): the counter grid maintained over a
document stream must agree cell-for-cell with the batch operator's sketch
over the same delivered documents (CMS mergeability), survive checkpoint
replay without double-counting, and absorb late files incrementally."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.dedup import release_cached
from observation_lakehouse_spark.operators.retrieval import cms_heavy_hitters
from observation_lakehouse_spark.streaming.cms import StreamingCountMinSketch

SCHEMA = "doc_id long, text string"
DEPTH, WIDTH = 4, 64

ROWS1 = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the cat food"),
    (3, "a dog and a cat and a rat"),
]
ROWS2 = [
    (4, "the rat ran from the cat"),
    (5, "dogs and cats and rats run"),
]
ROWS3 = [(6, "the the the cat cat dog")]


def _run(spark, cms, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = cms.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_est(spark, rows):
    """The batch sketch's estimates for every term it reports."""
    df = spark.createDataFrame(rows, SCHEMA)
    out = cms_heavy_hitters(df, depth=DEPTH, width=WIDTH, k=100)
    got = {r["term"]: (r["exact_cnt"], r["cms_est"]) for r in out.collect()}
    release_cached(out)
    return got


def test_stream_grid_matches_batch_sketch_and_replays_safely(spark, tmp_path):
    cms = StreamingCountMinSketch(
        spark, str(tmp_path / "state"), depth=DEPTH, width=WIDTH
    )
    # probing an EMPTY state is well-defined (left-join guard): estimate 0
    assert {
        r["term"]: r["cms_est"] for r in cms.estimate(["cat"]).collect()
    } == {"cat": 0}

    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, cms, landing, tmp_path / "ckpt")

    batch = _batch_est(spark, ROWS1 + ROWS2)
    est = {
        r["term"]: r["cms_est"]
        for r in cms.estimate(sorted(batch)).collect()
    }
    for term, (exact, batch_cms) in batch.items():
        assert est[term] == batch_cms, term  # cell-identical sketches
        assert est[term] >= exact  # CMS never underestimates

    # exactly-once: restart over the same checkpoint must not double-count
    v = cms.mv.table.latest_version()
    _run(spark, cms, landing, tmp_path / "ckpt")
    assert cms.mv.table.latest_version() == v

    # late-arriving file folds in incrementally; grid == batch over ALL docs
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, cms, landing, tmp_path / "ckpt")
    batch3 = _batch_est(spark, ROWS1 + ROWS2 + ROWS3)
    est3 = {
        r["term"]: r["cms_est"]
        for r in cms.estimate(sorted(batch3)).collect()
    }
    assert all(est3[t] == c for t, (_, c) in batch3.items())
    # state stayed grid-sized: at most depth*width cells, whatever streamed
    assert cms.grid().count() <= DEPTH * WIDTH
