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


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = the global 1-based row number under ``ORDER BY
    order_cols`` — the distributed form of an unpartitioned
    ``ROW_NUMBER()`` window — and return ``(frame, total_row_count)``.

    Same two-phase shape as :func:`global_prefix_sum` with COUNT partials:
    range-repartition on the order columns (physical partition order ==
    logical order; the combination must be a TOTAL order — include a unique
    tiebreak column), collect one row count per partition, broadcast the
    exclusive-scan offsets back, and finish with a per-partition
    ``row_number``. No stage ever holds more than one partition's rows in a
    single task, vs. the unpartitioned window's whole-table single-task
    sort (Spark's own ``WindowExec: No Partition Defined`` warning).

    The total count rides back for free from the partials — callers that
    need N for rank→bucket arithmetic (NTILE) get it without a second pass.
    Caller releases the persisted range stage via ``release_cached``
    (``_cached_deps`` contract).
    """
    for c in ("_pid", out_col):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column — rename it first")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    partials = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn")).collect()
    offset, offsets = 0, {}
    for row in sorted(partials, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = offset
        offset += row["_pn"]
    # Memoized literal frame (operators/similarity._memo_local_df): a bare
    # createDataFrame pins a fresh RDD id into the canonicalized plan, so
    # two builds of the same query would never compare plan-equal (the r6
    # CacheManager-reuse gotcha); the memo returns the SAME object for
    # identical contents within one application.
    from observation_lakehouse_spark.operators.similarity import _memo_local_df

    off_df = _memo_local_df(
        df.sparkSession,
        [(int(p), int(o)) for p, o in sorted(offsets.items())],
        "_pid int, _poff bigint",
    )
    w = Window.partitionBy("_pid").orderBy(*[F.asc(c) for c in order_cols])
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_poff") + F.row_number().over(w))
        .drop("_pid", "_poff")
    )
    out._cached_deps = (ranged,)  # noqa: SLF001 — release_cached contract
    return out, offset


def global_prefix_sums(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    out_cols: list[str],
    num_partitions: int | None = None,
    inclusive: bool = False,
) -> DataFrame:
    """Multi-column form of :func:`global_prefix_sum`: one range pass
    carries running sums for EVERY ``value_cols[i]`` into ``out_cols[i]``
    (``inclusive=True`` gives the current-row-included sum — cumulative
    counts for ECDFs — instead of the exclusive offset). Same two-phase
    shape, same contracts (unique non-null ``order_col``, caller releases
    via ``release_cached``); the partials pass collects one row per
    partition with all the sums, so adding columns costs nothing extra."""
    if len(value_cols) != len(out_cols) or not value_cols:
        raise ValueError("value_cols and out_cols must be equal-length, non-empty")
    for c in ("_pid", *out_cols):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column — rename it first")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    partials = ranged.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_ps{i}") for i, v in enumerate(value_cols)]
    ).collect()
    offs: dict[int, list[int]] = {}
    run = [0] * len(value_cols)
    for row in sorted(partials, key=lambda r: r["_pid"]):
        offs[row["_pid"]] = list(run)
        for i in range(len(value_cols)):
            run[i] += row[f"_ps{i}"] or 0
    off_schema = "_pid int, " + ", ".join(
        f"_poff{i} bigint" for i in range(len(value_cols))
    )
    off_df = df.sparkSession.createDataFrame(
        [(int(p), *[int(x) for x in o]) for p, o in sorted(offs.items())],
        off_schema,
    )
    upper = Window.currentRow if inclusive else -1
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    out = ranged.join(F.broadcast(off_df), "_pid")
    for i, (v, o) in enumerate(zip(value_cols, out_cols)):
        out = out.withColumn(
            o, F.col(f"_poff{i}") + F.coalesce(F.sum(v).over(w), F.lit(0))
        )
    out = out.drop("_pid", *[f"_poff{i}" for i in range(len(value_cols))])
    out._cached_deps = (ranged,)  # noqa: SLF001 — release_cached contract
    return out
