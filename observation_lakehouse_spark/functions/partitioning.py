"""Scan-parallelism guard for expression-heavy operators.

Spark parallelizes a parquet scan by file and row-group boundaries. A corpus
written as few large single-row-group files (the local testdata shape; also
real after aggressive compaction) therefore scans as a handful of partitions
— and any operator whose cost is dominated by per-row expression work
(shingling, hashing, tokenization) runs that work on a handful of cores no
matter the cluster size, because nothing upstream of the first shuffle can
split a partition.

:func:`parallelize_scan` repartitions ONLY when the input's partition count
is below the session's default parallelism — one extra shuffle of the raw
rows, paid exactly when it buys idle cores. At production scale (thousands
of files / row groups) the guard sees enough partitions and is a no-op, so
operators can apply it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_scan(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its plan
    currently yields fewer partitions than ``min_factor`` × that."""
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only helper, never fail the op
        return df
    if current < int(target * min_factor):
        return df.repartition(target)
    return df
