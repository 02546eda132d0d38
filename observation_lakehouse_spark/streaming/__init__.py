"""Structured Streaming paths (SURVEY.md §2.9 — our addition; the reference is
batch-append only, its CI-driven "continual" ingestion is declared future work
at reference README.md:163)."""

from observation_lakehouse_spark.streaming.ingest import (
    stream_observations_from_cells,
    streaming_observation_counts,
)

__all__ = ["stream_observations_from_cells", "streaming_observation_counts"]
