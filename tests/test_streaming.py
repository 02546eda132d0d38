"""Structured Streaming ingestion (availableNow over a landing dir) and the
watermark-windowed streaming aggregation."""

from __future__ import annotations

import pytest

from observation_lakehouse_spark.lakehouse import ObservationLakehouse
from observation_lakehouse_spark.streaming import (
    stream_observations_from_cells,
    streaming_observation_counts,
)


@pytest.fixture(scope="module")
def stream_lakehouse(spark):
    lh = ObservationLakehouse(spark, database="olake_stream")
    lh.create_observations_table()
    return lh


def test_stream_ingestion_available_now(spark, arena_cells, stream_lakehouse, tmp_path_factory):
    landing = tmp_path_factory.mktemp("landing")
    ckpt = tmp_path_factory.mktemp("ckpt")
    arena_cells.write.mode("overwrite").parquet(str(landing))

    q = stream_observations_from_cells(
        stream_lakehouse, str(landing), str(ckpt), data_set_id="dsS", available_now=True
    )
    q.awaitTermination(120)
    got = stream_lakehouse.load_observations_table()
    assert got.count() == 16  # same reshape as batch (test_ingest_arena)
    assert got.filter("implementation_id = 'sysA_default_0'").count() == 8

    # exactly-once: re-running over the same checkpoint adds nothing
    q2 = stream_observations_from_cells(
        stream_lakehouse, str(landing), str(ckpt), data_set_id="dsS", available_now=True
    )
    q2.awaitTermination(120)
    assert stream_lakehouse.load_observations_table().count() == 16


def test_streaming_windowed_counts_plan(spark, tmp_path_factory):
    """The windowed agg must be a valid *streaming* plan (watermark present,
    append-mode compatible) — validated by starting it on a file stream."""
    import datetime as dt

    from observation_lakehouse_spark.schemas import OBSERVATIONS_SCHEMA
    from tests.conftest import observation_rows

    src_dir = tmp_path_factory.mktemp("obs_src")
    out_dir = tmp_path_factory.mktemp("obs_out")
    ckpt = tmp_path_factory.mktemp("obs_ckpt")
    rows = [
        r[:15] + (dt.datetime(2026, 1, 1, 0, i % 30),) + r[16:]
        for i, r in enumerate(observation_rows()[:200])
    ]
    spark.createDataFrame(rows, OBSERVATIONS_SCHEMA).write.mode("overwrite").parquet(str(src_dir))

    stream = spark.readStream.schema(OBSERVATIONS_SCHEMA).parquet(str(src_dir))
    counts = streaming_observation_counts(stream, watermark="5 minutes", window_length="10 minutes")
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with availableNow the watermark
    # advances only between batches, so rows may be 0 — the contract here is
    # that the streaming plan is valid and runs to completion.
    out = spark.read.schema(counts.schema).parquet(str(out_dir))
    assert {"time_window", "data_set_id", "problem_id", "n_observations", "approx_impls"} <= set(
        out.columns
    )


def test_stream_replay_after_sink_commit_gap_is_exactly_once(
    spark, arena_cells, tmp_path_factory
):
    """The at-least-once window: a batch's table append succeeded but the
    checkpoint never recorded the batch as complete (crash between sink and
    commit). Simulated by deleting the checkpoint's commit marker after a
    successful run — restart re-executes batch 0 against the already-appended
    table. With the atomic format's idempotency key the replay is a no-op."""
    import shutil
    from pathlib import Path

    lh = ObservationLakehouse(spark, database="olake_stream_x1", table_format="atomic")
    lh.create_observations_table()
    landing = tmp_path_factory.mktemp("landing_x1")
    ckpt = tmp_path_factory.mktemp("ckpt_x1")
    arena_cells.write.mode("overwrite").parquet(str(landing))

    q = stream_observations_from_cells(
        lh, str(landing), str(ckpt), data_set_id="dsX", available_now=True
    )
    q.awaitTermination(120)
    assert lh.load_observations_table().count() == 16
    keys_after_run1 = set(lh._atomic("observations").committed_keys())
    assert keys_after_run1  # the batch recorded its idempotency key

    # crash window: the batch committed to the TABLE but not the CHECKPOINT
    shutil.rmtree(Path(str(ckpt)) / "commits", ignore_errors=True)

    q2 = stream_observations_from_cells(
        lh, str(landing), str(ckpt), data_set_id="dsX", available_now=True
    )
    q2.awaitTermination(120)
    # replayed batch recognized by its key → no duplicates, no new version
    assert lh.load_observations_table().count() == 16
    assert set(lh._atomic("observations").committed_keys()) == keys_after_run1


def test_dedup_stream_drops_intra_stream_duplicates(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark on the content digest: duplicates inside
    the horizon are admitted once, first arrival wins."""
    import datetime as dt

    from observation_lakehouse_spark.streaming.dedup import dedup_stream

    landing = tmp_path_factory.mktemp("doc-landing")
    out = tmp_path_factory.mktemp("doc-out")
    ckpt = tmp_path_factory.mktemp("doc-ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, "same text", t0),
        (2, "same text", t0 + dt.timedelta(seconds=30)),   # dup within horizon
        (3, "other text", t0 + dt.timedelta(seconds=60)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, event_time timestamp"
    ).write.mode("overwrite").parquet(str(landing))

    stream = spark.readStream.schema(
        "doc_id long, text string, event_time timestamp"
    ).parquet(str(landing))
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    assert got.count() == 2
    assert {r["doc_id"] for r in got.collect()} <= {1, 2, 3}
    assert got.filter("text = 'same text'").count() == 1
    # schema carries the digest for the downstream corpus anti-join
    assert "content_hash" in got.columns


def test_dedup_stream_agrees_with_batch_incremental_dedup(spark, tmp_path_factory):
    """Twin agreement (VERDICT r03 item 6): streaming dedup admission over two
    micro-batches must admit exactly what the oracle-checked batch operator
    (operators.dedup.incremental_dedup) admits for batch B against corpus A.
    Batch boundaries are forced with maxFilesPerTrigger=1 (file A lands before
    file B); each file is internally dup-free so the admitted doc_ids are
    fully deterministic on both paths."""
    import datetime as dt
    import time as _time

    from observation_lakehouse_spark.operators.dedup import incremental_dedup
    from observation_lakehouse_spark.streaming.dedup import dedup_stream

    landing = tmp_path_factory.mktemp("twin-landing")
    out = tmp_path_factory.mktemp("twin-out")
    ckpt = tmp_path_factory.mktemp("twin-ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "doc_id long, text string, event_time timestamp"
    a_rows = [(1, "alpha", t0), (2, "beta", t0), (3, "gamma", t0)]
    b_rows = [
        (11, "alpha", t0 + dt.timedelta(seconds=30)),  # dup of corpus
        (12, "delta", t0 + dt.timedelta(seconds=40)),  # fresh → admitted
        (13, "beta", t0 + dt.timedelta(seconds=50)),   # dup of corpus
        (14, "epsilon", t0 + dt.timedelta(seconds=60)),
    ]
    a_df = spark.createDataFrame(a_rows, schema)
    b_df = spark.createDataFrame(b_rows, schema)
    a_df.coalesce(1).write.parquet(str(landing / "a"))
    _time.sleep(1.1)  # file-source orders batches by modification time
    b_df.coalesce(1).write.parquet(str(landing / "b"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(landing) + "/*"
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    admitted_b = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} - {1, 2, 3}
    expected_b = {r["doc_id"] for r in incremental_dedup(b_df, a_df).collect()}
    assert admitted_b == expected_b == {12, 14}
    # corpus batch itself is admitted in full (it was first)
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1, 2, 3, 12, 14}


def test_counter_rollup_stream_agrees_with_batch_counter_increase(
    spark, tmp_path_factory
):
    """Twin agreement: the stateful streaming counter rollup's FINAL row per
    key over two micro-batches equals the oracle-checked batch operator
    (operators.timeseries.counter_increase) on the union of the batches.
    Micro-unit folding in the stream is exactly the batch DECIMAL(18,6)
    arithmetic, so the match is exact, not approximate."""
    import time as _time

    from observation_lakehouse_spark.operators.timeseries import counter_increase
    from observation_lakehouse_spark.streaming.counter import counter_rollup

    landing = tmp_path_factory.mktemp("ctr-landing")
    out = tmp_path_factory.mktemp("ctr-out")
    ckpt = tmp_path_factory.mktemp("ctr-ckpt")
    schema = "user_id long, ts long, event_id long, value double"
    a_rows = [  # batch A: u1 rising, u2 with an in-batch reset
        (1, 100, 1, 10.5), (1, 200, 2, 12.25),
        (2, 100, 3, 7.0), (2, 300, 4, 2.0),
    ]
    b_rows = [  # batch B: u1 resets across the batch boundary, u3 appears
        (1, 400, 5, 3.125), (1, 500, 6, 9.0),
        (3, 100, 7, 1.0),
    ]
    a_df = spark.createDataFrame(a_rows, schema)
    b_df = spark.createDataFrame(b_rows, schema)
    a_df.coalesce(1).write.parquet(str(landing / "a"))
    _time.sleep(1.1)  # file-source orders batches by modification time
    b_df.coalesce(1).write.parquet(str(landing / "b"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(landing) + "/*"
    )
    q = (
        counter_rollup(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per key = the running totals after all batches
    rows = spark.read.parquet(str(out)).collect()
    final = {}
    for r in rows:  # update mode re-emits; the max n_samples row is final
        cur = final.get(r["user_id"])
        if cur is None or r["n_samples"] > cur["n_samples"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r
        for r in counter_increase(
            a_df.unionByName(b_df), "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert set(final) == set(batch) == {1, 2, 3}
    for k in batch:
        assert final[k]["n_samples"] == batch[k]["n_samples"]
        assert final[k]["n_resets"] == batch[k]["n_resets"]
        assert final[k]["total_increase"] == batch[k]["total_increase"]
    # the cross-batch reset for u1 was seen (12.25 -> 3.125)
    assert final[1]["n_resets"] == 1
