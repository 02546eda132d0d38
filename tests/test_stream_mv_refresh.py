"""Streaming MV maintenance (streaming/mv_refresh.py): a file stream folds
into IncrementalAggregate exactly once; final state == one-shot aggregate
over everything the stream delivered (the twin-agreement pattern the batch
`incremental_mv` oracle also proves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

SCHEMA = "k string, v double"


def _mv(spark, path):
    return IncrementalAggregate(
        spark,
        str(path),
        keys=["k"],
        aggs={"n": ("count", "1"), "s": ("sum", "CAST(v AS DECIMAL(20,4))")},
    )


def _run(spark, mv, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    q = stream_mv_refresh(mv, stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def test_stream_mv_equals_batch_aggregate_and_replays_safely(spark, tmp_path):
    mv = _mv(spark, tmp_path / "mv")
    landing = tmp_path / "landing"
    rows1 = [("a", 1.5), ("b", 2.0), ("a", 0.5)]
    rows2 = [("b", 3.0), ("c", 4.25)]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(rows2, SCHEMA).write.parquet(str(landing / "f2"))

    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt")
    got = {r["k"]: (r["n"], float(r["s"])) for r in mv.read().collect()}
    assert got == {"a": (2, 2.0), "b": (2, 5.0), "c": (1, 4.25)}

    # exactly-once: a restart over the same checkpoint must not double-count
    # (a replayed fold would corrupt the aggregate, not just duplicate rows)
    v = mv.table.latest_version()
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt")
    assert mv.table.latest_version() == v
    assert {r["k"]: (r["n"], float(r["s"])) for r in mv.read().collect()} == got

    # late-arriving file: only the delta folds in
    spark.createDataFrame([("a", 10.0)], SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt")
    got2 = {r["k"]: (r["n"], float(r["s"])) for r in mv.read().collect()}
    assert got2["a"] == (3, 12.0) and got2["b"] == got["b"]


def test_stream_mv_matches_full_recompute(spark, tmp_path):
    import random

    rnd = random.Random(3)
    mv = _mv(spark, tmp_path / "mv2")
    landing = tmp_path / "landing2"
    all_rows = []
    for i in range(3):
        rows = [(f"k{rnd.randrange(4)}", round(rnd.uniform(0, 9), 2)) for _ in range(25)]
        all_rows += rows
        spark.createDataFrame(rows, SCHEMA).write.parquet(str(landing / f"f{i}"))
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt2")
    expect = {
        r["k"]: (r["n"], float(r["s"]))
        for r in spark.createDataFrame(all_rows, SCHEMA)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(v AS DECIMAL(20,4))")).alias("s"),
        )
        .collect()
    }
    got = {r["k"]: (r["n"], float(r["s"])) for r in mv.read().collect()}
    assert got == expect
