"""Structured Streaming paths (SURVEY.md §2.9 — our addition; the reference is
batch-append only, its CI-driven "continual" ingestion is declared future work
at reference README.md:163)."""

from observation_lakehouse_spark.streaming.cdc_apply import stream_cdc_apply
from observation_lakehouse_spark.streaming.dedup import dedup_stream
from observation_lakehouse_spark.streaming.ingest import (
    stream_observations_from_cells,
    streaming_observation_counts,
)
from observation_lakehouse_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)
from observation_lakehouse_spark.streaming.stateful import sessionize

__all__ = [
    "dedup_stream",
    "stream_cdc_apply",
    "sessionize",
    "stream_observations_from_cells",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "streaming_observation_counts",
]
