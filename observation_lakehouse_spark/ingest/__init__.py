"""Ingestion pipelines: raw exports → the three lakehouse tables.

:mod:`arena` rebuilds the reference's LASSO-arena ingestion
(/root/reference/olake/ingest/arena.py) Spark-first: glob Parquet scan →
declarative reshape (ordered aggregation, conditional pivots, id minting) →
atomic append. Solr JSON code exports go through ``spark.read.json`` +
``explode`` instead of a Python loop.
"""

from observation_lakehouse_spark.ingest.arena import (
    reshape_code_implementations,
    reshape_observations,
    reshape_tests,
)

__all__ = [
    "reshape_observations",
    "reshape_tests",
    "reshape_code_implementations",
]
