"""Streaming materialized-view maintenance: a stream folds into an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
one micro-batch at a time.

This closes the serving loop: ingestion appends raw rows at stream rate, the
MV absorbs each batch at O(batch + |keys|) cost, and interactive readers scan
the keys-sized state table — the streaming version of the answer to the
reference's re-aggregate-per-query interactive loop (its DuckDB view re-runs
the aggregate per request, benchmark_srm_output_view.py:62).

Exactly-once: each micro-batch refreshes under an idempotency key derived
from (checkpoint, batch_id). A batch replayed after a crash between the MV
commit and the checkpoint write is recognized inside the commit protocol and
skipped — folding the same delta twice would double-count it, which is why
the key lives in the SAME atomic manifest publish as the state (the same
argument as streaming/ingest.py, sharpened: append replay merely duplicates
rows, MV replay corrupts aggregates).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate


def stream_mv_refresh(
    mv: IncrementalAggregate,
    stream: DataFrame,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously maintain ``mv`` from a streaming DataFrame of source rows."""
    ckpt = checkpoint or f"/tmp/mv_refresh_ckpt_{uuid.uuid4().hex}"
    ckpt_id = uuid.uuid5(uuid.NAMESPACE_URL, ckpt).hex

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mv.refresh(batch_df, idempotency_key=f"mv:{ckpt_id}:{batch_id}")

    writer = stream.writeStream.foreachBatch(fold).option("checkpointLocation", ckpt)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_mv_refresh_retractions(
    mv: IncrementalAggregate,
    change_stream: DataFrame,
    source: "callable | None" = None,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously maintain ``mv`` from a streaming CHANGE FEED (rows
    tagged ``_change_type`` 'insert' / 'delete' — a CDC topic, or
    change-feed files exported by ``AtomicParquetTable``).

    The streaming leg of the counting algorithm (r12): each micro-batch
    folds through :meth:`IncrementalAggregate.refresh_retractions` under
    the same (checkpoint, batch_id) idempotency key as the append path —
    a replayed batch would otherwise double-retract. With ``extrema_k``
    views, ``source`` is a zero-arg callable returning the CURRENT
    post-change corpus (e.g. ``table.read``): it is consulted lazily and
    ONLY for the rare batch whose deletes drain a candidate frontier, so
    the steady-state per-batch cost stays O(batch + touched groups). A
    frontier drain with no source raises inside the batch — loud, exactly
    like the batch API.
    """
    ckpt = checkpoint or f"/tmp/mv_retract_ckpt_{uuid.uuid4().hex}"
    ckpt_id = uuid.uuid5(uuid.NAMESPACE_URL, ckpt).hex

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mv.refresh_retractions(
            batch_df,
            idempotency_key=f"mvr:{ckpt_id}:{batch_id}",
            source=source() if source is not None else None,
        )

    writer = change_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
