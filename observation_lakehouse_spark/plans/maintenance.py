"""Table-maintenance jobs (SURVEY.md §2.1 S11, §4 "data clustering").

The reference designed but disabled a sort order (implementation_id, test_id,
step_id) inside each partition — "FIXME z-ordering (only do this from time to
time to avoid rewrites!)" (/root/reference/olake/lakehouse.py:157-165). On a
table format with native maintenance this is ``OPTIMIZE ... ZORDER BY`` (Delta)
or a sorted ``rewrite_data_files`` (Iceberg). For the plain-Parquet fallback the
equivalent is a periodic rewrite that coalesces small files and sorts rows
within each partition — which is exactly what min/max row-group pruning needs
to make (impl, test, step) range scans cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from observation_lakehouse_spark.schemas import PARTITION_COLUMNS

SORT_COLUMNS = ("implementation_id", "test_id", "step_id")


def compact_sort_partitions(
    df: DataFrame,
    output_path: str,
    sort_columns: tuple[str, ...] = SORT_COLUMNS,
    target_files_per_partition: int = 1,
) -> None:
    """Rewrite a partitioned table: few files per partition, sorted within.

    ``repartition(partition cols)`` co-locates each (data_set_id, problem_id)
    before the write (one output file per partition instead of one per input
    task); ``sortWithinPartitions`` lines rows up for row-group min/max pruning
    on the sort columns. Run 'from time to time', as the reference comment says
    — it is a full rewrite of the touched partitions.

    ``target_files_per_partition`` is an upper bound per partition dir, split
    by a deterministic sort-key salt: task-hash collisions can merge salts, and
    AQE coalesces away splits whose outputs are small — which is the desired
    behavior (the knob matters exactly when partitions are big enough that AQE
    keeps the splits).
    """
    keys = [df[c] for c in PARTITION_COLUMNS]
    if target_files_per_partition > 1:
        # Salt derived from the sort key splits each table partition across N
        # shuffle tasks → N files per partition dir. (A bare
        # repartition(N, keys) would set the TOTAL task count instead.)
        from pyspark.sql import functions as F

        salt = F.pmod(
            F.xxhash64(*[df[c] for c in sort_columns]),
            F.lit(target_files_per_partition),
        )
        repartitioned = df.repartition(*keys, salt)
    else:
        repartitioned = df.repartition(*keys)
    compacted = repartitioned.sortWithinPartitions(*[df[c] for c in sort_columns])
    compacted.write.mode("overwrite").partitionBy(*PARTITION_COLUMNS).parquet(output_path)
