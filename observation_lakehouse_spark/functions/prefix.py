"""Distributed global prefix sum — the scale-safe form of
``SUM(...) OVER (ORDER BY ...)`` with no PARTITION BY.

An unpartitioned window moves EVERY row to one partition (Spark itself warns
``No Partition Defined for Window operation``) — fine for a 30-row rollup,
fatal for a corpus-wide running offset. The classic two-phase scan fixes it:

1. Range-repartition by the order column, so physical partition order equals
   logical order and each partition holds a contiguous key range.
2. One tiny per-partition partial-sum aggregate (``partition_count`` rows)
   is collected to the driver, turned into per-partition STARTING offsets
   (an exclusive scan over at most a few thousand numbers), and joined back
   as a broadcast.
3. Within each partition, an ordinary partitioned window finishes the sum.

The result is identical to the single-partition window for any UNIQUE order
column (range partitioning cannot split equal keys, so uniqueness makes the
order total), while every stage stays bounded: the only driver-side data is
one number per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE running sum of ``value_col`` in
    ``order_col`` order (the first row gets 0). ``order_col`` must be unique
    and non-null — it is what makes the global order total; ``value_col``
    must be integer-typed (the offsets ride as BIGINTs).

    Equivalent to ``SUM(value) OVER (ORDER BY order_col ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` without the single-partition
    collapse; see module docstring for the two-phase shape.
    """
    for c in ("_pid", out_col):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column — rename it first")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # persist: the partial-sum pass and the final join must see the SAME
    # physical partitioning — spark_partition_id on a recomputed range
    # partition is deterministic in practice (seeded boundary sampling) but
    # the cache makes it a guarantee, and the ranged rows feed both branches
    # anyway. Caller releases via release_cached(out).
    ranged = (
        df.repartitionByRange(parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    partials = (
        ranged.groupBy("_pid").agg(F.sum(value_col).alias("_psum")).collect()
    )
    # exclusive scan over the per-partition sums (range partitions are
    # ordered by _pid construction)
    offset, offsets = 0, {}
    for row in sorted(partials, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = offset
        offset += row["_psum"] or 0
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _poff bigint"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            F.col("_poff") + F.coalesce(F.sum(value_col).over(w), F.lit(0)),
        )
        .drop("_pid", "_poff")
    )
    out._cached_deps = (ranged,)  # noqa: SLF001 — release_cached contract
    return out
