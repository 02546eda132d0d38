"""Source / sink helpers (SURVEY.md §2.1 S1-S11)."""

from observation_lakehouse_spark.sources.io import (
    read_arena_export,
    read_solr_docs,
    to_pandas,
    union_datasets,
    write_csv,
    write_partitioned_parquet,
)

__all__ = [
    "read_arena_export",
    "read_solr_docs",
    "union_datasets",
    "write_csv",
    "write_partitioned_parquet",
    "to_pandas",
]
