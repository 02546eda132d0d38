"""Reusable column expressions and pandas UDFs.

- :mod:`ordered_agg` — ordered aggregation idioms (Spark's answer to DuckDB's
  ``ORDER BY`` inside aggregates, SURVEY.md §2.4 A2/A7/A8).
- :mod:`hashing` — git-blob hashing + source normalization (U1/U2).
- :mod:`text` — tokenization, n-grams, quality metrics shared by the text and
  dedup operators.
"""

from observation_lakehouse_spark.functions.hashing import git_blob_hash_udf, normalize_source
from observation_lakehouse_spark.functions.ordered_agg import (
    ordered_string_agg,
    ordered_values,
)

__all__ = [
    "ordered_values",
    "ordered_string_agg",
    "git_blob_hash_udf",
    "normalize_source",
]
