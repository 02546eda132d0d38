"""Change-data-capture operators: log compaction and MERGE-style upsert.

The reference's store is append-only with snapshot commits (reference
olake/ingest/arena.py:138-146); a lakehouse serving mutable upstream systems
also needs the two standard CDC reductions, both pure DataFrame plans:

- :func:`latest_per_key` — compact a change log to the newest row per key
  (the QUALIFY ROW_NUMBER() = 1 idiom): one window over the key, shuffle
  carries (key, ordering) — the arg-max pattern that turns an append log
  into a current-state table.
- :func:`apply_changes` — MERGE INTO semantics without a table format:
  upserts overwrite matched keys, optional tombstones delete, unmatched base
  rows pass through. Implemented as compact(changes) + anti-join + union —
  two key-partitioned shuffles, no full outer join (an outer join would
  force both sides wide; the anti-join only moves keys).

At 100 TB the change batch is orders of magnitude smaller than the base:
Catalyst broadcasts the compacted change side of the anti-join automatically
(or AQE converts it at runtime), so the base table is read once, map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """Newest row per key: ROW_NUMBER() = 1 over ``order_by`` DESC.

    ``order_by`` must be a total order within a key (append a unique
    column — e.g. an event/sequence id — to break timestamp ties
    deterministically); the result keeps the input schema.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    rn = "_rn"
    while rn in df.columns:  # keep a user `_rn` column intact
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE the newest change per key into ``base``.

    - matched + newest change is a delete (``delete_col`` true) → row removed
    - matched + upsert → change row replaces the base row
    - unmatched change → inserted; unmatched base → unchanged

    ``changes`` must share ``base``'s schema plus the optional boolean
    ``delete_col``. The change log is compacted per key FIRST (so one batch
    may carry several versions of a key, like a Debezium topic), then the
    base anti-joins the touched keys and the surviving upserts union in.
    """
    compacted = latest_per_key(changes, keys, order_by)
    survivors = (
        compacted.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
        if delete_col is not None
        else compacted
    )
    # project back to the base schema: the change log's bookkeeping columns
    # (sequence numbers, tombstone flags) don't belong in the merged table
    upserts = survivors.select(*base.columns)
    touched = compacted.select(*keys)
    untouched = base.join(touched, keys, "left_anti")
    return untouched.unionByName(upserts)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Snapshot reconciliation: row-level diff of two versions of a table.

    Returns one row per key present in either side with ``change_type`` in
    ``inserted`` (new only) / ``deleted`` (old only) / ``updated`` (both, any
    non-key column differs, NULL-safe). Unchanged rows are dropped — at
    snapshot scale the diff is usually a sliver of the table, and dropping
    the common mass early keeps the output (and any downstream sync) sized
    by the CHANGE, not the table. Pairs with AtomicParquetTable time travel:
    ``table_diff(t.read(v1), t.read(v2), keys)`` is "what did commits
    v1..v2 do", derived from data rather than trusted metadata.

    Shape: one full-outer shuffle join on the key columns; non-key columns
    compare as packed structs with IS DISTINCT FROM (one vectorized
    comparison, NULL-safe, no per-column predicate chain).
    """
    val_cols = [c for c in old.columns if c not in keys]
    if [c for c in new.columns if c not in keys] != val_cols:
        raise ValueError("old/new must share one schema")
    o = old.select(*keys, F.struct(*val_cols).alias("_o"))
    n = new.select(*keys, F.struct(*val_cols).alias("_n"))
    joined = o.join(n, keys, "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("_o").isNull(), F.lit("inserted"))
            .when(F.col("_n").isNull(), F.lit("deleted"))
            .when(F.expr("_o IS DISTINCT FROM _n"), F.lit("updated"))
            .otherwise(F.lit("unchanged")),
        )
        .filter(F.col("change_type") != "unchanged")
        .select(*keys, "change_type")
        .orderBy(*keys)
    )


def scd2_build(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str] | None = None,
    open_end_ts: int = 9_223_372_036_854_775_807,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 (Kimball): turn an append-only
    change log into versioned dimension rows with validity intervals —
    ``(keys, attrs, valid_from, valid_to, is_current)`` where
    ``valid_to`` is the NEXT change's timestamp (half-open
    ``[valid_from, valid_to)``) and the newest row per key is open-ended.
    The standard warehouse shape for "what did this customer's segment
    look like when the order was placed?" — the as-of join's natural
    partner table.

    Consecutive changes carrying IDENTICAL attribute values collapse into
    one interval (no-op updates in a CDC feed must not fragment history);
    same-timestamp duplicates collapse to ONE deterministic winner (the
    highest attribute digest — arrival order is not an observable in a
    distributed log, so the tie rule must be content-based to be engine-
    and partition-independent).

    Scale shape: one key-partitioned window pass (never corpus-global):
    rank + change-detection lag + lead, all over the same (keys) hash
    partitioning — Spark plans ONE exchange reused by all three window
    functions. Returns total (keys, valid_from) order.
    """
    if attr_cols is None:
        attr_cols = [
            c for c in changes.columns if c not in set(keys) | {ts_col}
        ]
    ts = F.col(ts_col).cast("long")
    # total in-key order: ts, then an attribute digest (tie determinism)
    dig = F.sha2(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in attr_cols]), 256
    )
    base = changes.select(
        *keys, ts.alias("_ts"), *attr_cols, dig.alias("_dig")
    )
    # same-ts duplicates: keep the last row of the tie order
    w_ts = Window.partitionBy(*keys, "_ts").orderBy(F.desc("_dig"))
    dedup = base.withColumn("_r", F.row_number().over(w_ts)).filter(
        F.col("_r") == 1
    ).drop("_r")
    w2 = Window.partitionBy(*keys).orderBy(F.asc("_ts"))
    marked = dedup.withColumn(
        "_changed",
        F.coalesce(F.lag("_dig").over(w2) != F.col("_dig"), F.lit(True)),
    ).filter(F.col("_changed"))
    out = (
        marked.withColumn("_next", F.lead("_ts").over(w2))
        .select(
            *keys,
            *attr_cols,
            F.col("_ts").alias("valid_from"),
            F.coalesce(F.col("_next"), F.lit(open_end_ts)).alias("valid_to"),
            F.col("_next").isNull().alias("is_current"),
        )
        .orderBy(*keys, "valid_from")
    )
    return out
