"""Streaming quantile monitor (streaming/quantile.py): the histogram state
must equal the batch twin bin-for-bin over the same delivered rows
(histogram mergeability), survive checkpoint replay without double-counting,
absorb late files, and answer quantiles within one bin width of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.streaming.quantile import (
    StreamingQuantileMonitor,
    value_histogram,
)

SCHEMA = "event_id long, event_type string, value double"
LO, HI, BINS = 0.0, 100.0, 50
STEP = (HI - LO) / BINS

ROWS1 = [(i, "click", float(i % 97)) for i in range(200)]
ROWS2 = [(200 + i, "view", float((i * 7) % 101)) for i in range(150)]
ROWS3 = [(400 + i, "click", 250.0) for i in range(10)]  # clamped overflow


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_hist(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.k, r.bin): r.c
        for r in value_histogram(df, "event_type", "value", LO, HI, BINS).collect()
    }


def test_stream_hist_matches_batch_and_replays_safely(spark, tmp_path):
    mon = StreamingQuantileMonitor(
        spark, str(tmp_path / "state"), lo=LO, hi=HI, n_bins=BINS
    )
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    got = {(r.k, r.bin): r.c for r in mon.hist().collect()}
    assert got == _batch_hist(spark, ROWS1 + ROWS2)

    # exactly-once: a restart over the same checkpoint must not re-fold
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late file folds in incrementally; overflow values clamp to the last bin
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    got3 = {(r.k, r.bin): r.c for r in mon.hist().collect()}
    assert got3 == _batch_hist(spark, ROWS1 + ROWS2 + ROWS3)
    assert got3[("click", BINS - 1)] >= 10  # the clamped rows

    # quantile estimates: never below the exact ceil-rank quantile, and at
    # most one bin width above its bin's upper edge (one-sided bound)
    import math

    vals = sorted(min(max(v, LO), HI - STEP / 2) for _, t, v in ROWS1 + ROWS3 if t == "click")
    est = {
        (r.k, round(r.q, 2)): r.est for r in mon.quantiles(qs=(0.5, 0.95)).collect()
    }
    n = len(vals)
    for q in (0.5, 0.95):
        exact = vals[math.ceil(q * n) - 1]
        e = est[("click", q)]
        assert e >= exact - 1e-9, (q, e, exact)
        assert e <= exact + 2 * STEP + 1e-9, (q, e, exact)

    # state stays bounded: at most keys x bins rows
    assert mon.hist().count() <= 2 * BINS


def test_quantiles_on_empty_state_is_empty(spark, tmp_path):
    mon = StreamingQuantileMonitor(spark, str(tmp_path / "state2"))
    assert mon.quantiles().count() == 0


def test_incremental_aggregate_rejects_mismatched_key_types(spark, tmp_path):
    import pytest

    from observation_lakehouse_spark.plans.incremental import IncrementalAggregate

    with pytest.raises(ValueError, match="key_types"):
        IncrementalAggregate(
            spark,
            str(tmp_path / "bad"),
            keys=["a", "b"],
            key_types=["string"],
            aggs={"c": ("count", "1")},
        )
