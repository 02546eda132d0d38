"""Streaming CDC apply: a change stream continuously MERGEs into a snapshot
table — the integration of the three pieces a mutable-upstream lakehouse
needs: :mod:`operators.cdc` (MERGE semantics), :class:`transaction.
AtomicParquetTable` (atomic snapshot commits + idempotent retries), and
Structured Streaming's ``foreachBatch``.

Semantics per micro-batch:

1. Compact the batch's changes per key (newest wins — one batch may carry a
   key's whole Debezium-style history, including delete-then-resurrect).
2. MERGE into the table's CURRENT snapshot (upserts replace, tombstones
   delete, untouched rows carry over) via
   :func:`~observation_lakehouse_spark.operators.cdc.apply_changes`.
3. Commit the merged state as the table's next snapshot with an idempotency
   key derived from (checkpoint, batch_id): a replayed batch after a crash
   between commit and checkpoint is recognized and skipped — exactly-once.

The merged state is committed as a FULL-replacement snapshot (files list =
this batch's output), which keeps history time-travelable per batch. This is
the copy-on-write MERGE strategy: right for dimension-sized tables and
moderate change rates (every batch rewrites the table). A merge-on-read
strategy (commit deltas, merge at query time) is the complement for
fact-sized tables — compose :func:`operators.cdc.latest_per_key` over an
append-only change table for that shape.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.operators.cdc import apply_changes
from observation_lakehouse_spark.transaction import AtomicParquetTable, CommitConflict


def stream_cdc_apply(
    table: AtomicParquetTable,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    delete_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously apply a change stream to ``table``; returns the query.

    ``changes`` must be a streaming DataFrame carrying the table's columns
    plus ``order_by`` (and optionally ``delete_col``). Each micro-batch
    replaces the table's snapshot with the merged state under an idempotent
    commit — see module doc for the exactly-once argument.
    """
    ckpt = checkpoint or f"/tmp/cdc_apply_ckpt_{uuid.uuid4().hex}"
    ckpt_id = uuid.uuid5(uuid.NAMESPACE_URL, ckpt).hex

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = f"cdc:{ckpt_id}:{batch_id}"
        # The pre-check is an optimization only; correctness comes from the
        # commit itself: the idempotency key is re-checked inside the
        # manifest-publish loop, and expected_version pins the replacement to
        # the exact snapshot it was merged FROM. A zombie driver committing
        # between our read() and commit_replace() raises CommitConflict here
        # instead of being silently overwritten (lost update), and we re-merge
        # against the new head.
        for _ in range(3):
            if key in table.committed_keys():
                return  # replay after crash-between-commit-and-checkpoint
            base_v = table.latest_version()
            base = table.read(version=base_v)
            merged = apply_changes(base, batch_df, keys, order_by, delete_col=delete_col)
            # Full-replacement snapshot: stage the merged state, then commit
            # its files as the table's entire file list in one idempotent
            # manifest.
            staged = table.stage(merged)
            try:
                table.commit_replace(staged, idempotency_key=key, expected_version=base_v)
                return
            except CommitConflict:
                continue  # head moved under us — re-read, re-merge, retry
        raise CommitConflict(f"batch {batch_id}: table kept advancing during merge retries")

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_into(
    table: AtomicParquetTable,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    delete_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """The MERGE-ON-READ twin of :func:`stream_cdc_apply` (r10, rides
    :meth:`~observation_lakehouse_spark.transaction.AtomicParquetTable.
    merge_into`): each micro-batch compacts newest-wins per key, then
    upserts land as a row-level MERGE — matched rows become a deletion
    vector + rewritten rows, inserts append, UNTOUCHED ROWS ARE NEVER
    COPIED — and tombstones follow as a matched-delete MERGE (DV only).
    The fact-table shape: per-batch cost tracks the batch's keys, not the
    table (stream_cdc_apply rewrites the whole snapshot per batch — right
    for dimensions, quadratic-ish for facts).

    Exactly-once: each sub-action commits under its own (checkpoint,
    batch_id)-derived idempotency key, and merge_into pins its positions to
    the head it computed them against — a racing writer raises
    CommitConflict and the batch re-merges against the new head. A batch is
    up to TWO commits (upserts, then deletes), each individually atomic and
    replay-safe; a crash between them resumes at the delete step on replay.
    """
    ckpt = checkpoint or f"/tmp/merge_into_ckpt_{uuid.uuid4().hex}"
    ckpt_id = uuid.uuid5(uuid.NAMESPACE_URL, ckpt).hex
    data_cols = [f.name for f in table.schema.fields]
    upd = {c: f"src_{c}" for c in data_cols if c not in keys}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from observation_lakehouse_spark.operators.cdc import latest_per_key

        latest = latest_per_key(batch_df, keys, order_by).localCheckpoint(eager=True)
        ups = latest
        dels = None
        if delete_col is not None:
            ups = latest.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
            dels = latest.filter(F.coalesce(F.col(delete_col), F.lit(False)))
        ups = ups.select(*data_cols)
        for attempt in range(5):
            try:
                table.merge_into(
                    ups,
                    on=keys,
                    when_matched_update=upd,
                    idempotency_key=f"mrg:{ckpt_id}:{batch_id}:u",
                )
                break
            except CommitConflict:
                if attempt == 4:
                    raise
        if dels is not None:
            for attempt in range(5):
                try:
                    table.merge_into(
                        dels.select(*keys),
                        on=keys,
                        when_matched_delete=True,
                        when_not_matched_insert=False,
                        idempotency_key=f"mrg:{ckpt_id}:{batch_id}:d",
                    )
                    break
                except CommitConflict:
                    if attempt == 4:
                        raise

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
