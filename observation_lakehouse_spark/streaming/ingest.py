"""Streaming ingestion: arena cell exports land continuously → observations table.

Two pieces:

- :func:`stream_observations_from_cells` — file-source ``readStream`` over a
  landing directory of arena Parquet exports, reshaped per micro-batch via
  ``foreachBatch`` with the SAME batch transform ingestion uses
  (:func:`reshape_observations`). ``foreachBatch`` is the right tool because the
  reshape is a multi-aggregate pivot per sheet: an arena export file is a
  complete, self-contained execution dump (the reference ingests whole files
  too — /root/reference/olake/ingest/arena.py:58-64), so grouping within the
  micro-batch is exact and needs no watermark state.

  Delivery semantics depend on the sink table's format. ``foreachBatch`` is
  at-least-once by itself: after a failure between the table append and the
  checkpoint commit, restart re-runs the batch and a plain parquet
  ``insertInto`` would duplicate it. With the ``atomic`` lakehouse format the
  sink passes an idempotency key derived from (checkpoint, batch_id) into the
  manifest commit, so the replayed batch is recognized and skipped —
  exactly-once end to end (proved by the restart-replay test). For catalog
  parquet tables the checkpoint only de-duplicates INPUT files; the sink
  append itself remains at-least-once, stated here rather than papered over.
- :func:`streaming_observation_counts` — a watermark-windowed streaming
  aggregation (observations per problem per minute) showing the late-data
  policy for continuous analytics: 10-minute watermark on created_at, append
  mode, windows close when the watermark passes.

At scale: the file source lists incrementally (``maxFilesPerTrigger`` bounds a
batch); state for the windowed agg is per (problem, window) — small and keyed
the same way the tables are partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.ingest.arena import reshape_observations
from observation_lakehouse_spark.lakehouse import ObservationLakehouse
from observation_lakehouse_spark.schemas import ARENA_EXPORT_SCHEMA


def stream_observations_from_cells(
    lakehouse: ObservationLakehouse,
    landing_dir: str,
    checkpoint_dir: str,
    data_set_id: str = "Arena",
    max_files_per_trigger: int = 100,
    available_now: bool = False,
) -> StreamingQuery:
    """readStream(landing_dir) → reshape per micro-batch → append to table."""
    spark: SparkSession = lakehouse.spark
    cells = (
        spark.readStream.schema(ARENA_EXPORT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        observations = reshape_observations(batch_df, data_set_id=data_set_id)
        # The key identifies this micro-batch across restarts: Structured
        # Streaming replays a batch with the SAME id from the SAME checkpoint,
        # and distinct queries have distinct checkpoints. Atomic-format tables
        # record it inside the manifest commit → replay becomes a no-op.
        lakehouse.append_observations(
            observations, idempotency_key=f"{checkpoint_dir}#{batch_id}"
        )

    writer = (
        cells.writeStream.option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_observation_counts(
    observations_stream: DataFrame,
    watermark: str = "10 minutes",
    window_length: str = "1 minute",
) -> DataFrame:
    """Watermarked per-problem / per-window observation counts (append mode).

    Input: a streaming DataFrame with the observations schema. Late rows beyond
    the watermark are dropped; a window emits once closed.

    ``created_at`` is TIMESTAMP_NTZ in the table contract (Iceberg µs no-tz);
    watermarks require an instant, so the event time is the NTZ value pinned to
    the session timezone (UTC per the session factory).
    """
    event_time = F.col("created_at").cast("timestamp")
    return (
        observations_stream.withColumn("event_time", event_time)
        .withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window_length).alias("time_window"),
            "data_set_id",
            "problem_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_observations"),
            F.approx_count_distinct("implementation_id").alias("approx_impls"),
        )
    )
