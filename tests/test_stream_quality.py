"""Streaming constraint monitor (streaming/quality.py): cumulative metrics
over a file stream agree with the batch constraint_audit on the same rows
(twin agreement), survive checkpoint replay exactly-once, and flip a passed
flag when a late batch introduces a violation."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.audit import (
    MICRO,
    constraint_audit,
    ratio_micro,
)
from observation_lakehouse_spark.streaming.quality import StreamingConstraintMonitor

SCHEMA = "k long, status string, price double"

RATIOS = {
    "status_in_domain": "status IN ('O','F')",
    "k_nonnull": "k IS NOT NULL",
}
MINS = {"price_min_positive": "price"}


def _monitor(spark, path):
    return StreamingConstraintMonitor(spark, str(path), RATIOS, MINS)


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_twin(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    n = F.count(F.lit(1))
    return constraint_audit(
        df,
        [
            (
                "status_in_domain",
                ratio_micro(
                    F.sum(F.when(F.col("status").isin("O", "F"), 1).otherwise(0)), n
                ),
                lambda m: m == MICRO,
            ),
            (
                "k_nonnull",
                ratio_micro(F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)), n),
                lambda m: m == MICRO,
            ),
            (
                "price_min_positive",
                F.round(F.min("price") * F.lit(1_000_000.0)).cast("long"),
                lambda m: m > 0,
            ),
        ],
    )


def test_stream_metrics_match_batch_audit_and_replay_safely(spark, tmp_path):
    mon = _monitor(spark, tmp_path / "state")
    landing = tmp_path / "landing"
    rows1 = [(1, "O", 3.5), (2, "F", 1.25), (3, "O", 9.0)]
    rows2 = [(4, "F", 0.5), (None, "O", 2.0)]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(rows2, SCHEMA).write.parquet(str(landing / "f2"))

    _run(spark, mon, landing, tmp_path / "ckpt")
    got = {r["check"]: (r["metric_micro"], r["passed"]) for r in mon.metrics().collect()}
    expect = {
        r["check"]: (r["metric_micro"], r["passed"])
        for r in _batch_twin(spark, rows1 + rows2).collect()
    }
    assert got == expect
    assert got["k_nonnull"] == (800_000, False)  # 1 NULL of 5
    assert got["status_in_domain"] == (MICRO, True)
    assert got["price_min_positive"] == (500_000, True)

    # exactly-once: a restart over the same checkpoint must not re-fold
    # (a double-fold inflates both ratio sums — possibly SILENTLY keeping
    # the ratio green, which is why this is tested on the metric values).
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v
    assert {
        r["check"]: (r["metric_micro"], r["passed"]) for r in mon.metrics().collect()
    } == got


def test_late_batch_flips_conformance(spark, tmp_path):
    mon = _monitor(spark, tmp_path / "state2")
    landing = tmp_path / "landing2"
    spark.createDataFrame([(1, "O", 2.0)], SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, mon, landing, tmp_path / "ckpt2")
    m0 = {r["check"]: r["passed"] for r in mon.metrics().collect()}
    assert m0 == {"k_nonnull": True, "price_min_positive": True, "status_in_domain": True}

    # a bad status and a negative price arrive late
    spark.createDataFrame([(2, "X", -1.0)], SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt2")
    got = {r["check"]: (r["metric_micro"], r["passed"]) for r in mon.metrics().collect()}
    assert got["status_in_domain"] == (500_000, False)
    assert got["price_min_positive"] == (-1_000_000, False)
    assert got["k_nonnull"] == (MICRO, True)
