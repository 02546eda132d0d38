"""Streaming sequential-pattern census — the continuous twin of the batch
``operators.behavior.frequent_paths`` (top-k 3-step event paths).

Two composed pieces, each already proven by its batch/streaming siblings:

1. **Per-user path deltas** via ``applyInPandasWithState``: the state is
   just the user's LAST TWO event types (two strings — O(active users)
   state at any event volume). Each micro-batch, the user's new events are
   sorted by (ts, event_id), prefixed with the stored tail, and every
   3-window is emitted as a path delta. Because the stored tail is exactly
   2 events and every emitted window is length 3, every window ends at a
   NEW event — boundary-crossing paths are counted once and nothing is
   double-counted across batches.
2. **Exactly-once census fold**: the (path, n) deltas fold into an
   :class:`~observation_lakehouse_spark.plans.incremental.
   IncrementalAggregate` keyed by path under a (checkpoint, batch_id)
   idempotency key — a replayed micro-batch re-derives the same deltas from
   the recovered state and the fold no-ops (the streaming/cms.py protocol).

Ordering: within a micro-batch events sort by (ts, event_id); cross-batch
order is source arrival order — the same stated at-least-ordered caveat as
``streaming/counter.py`` (bound it upstream with a watermark + sorted
repartition if the source reorders).

The census read is the keys-sized state table: (path, n_occurrences) —
|event_type|^depth rows, never the stream history. (n_users is deliberately
NOT tracked: distinct-users-per-path state is unbounded; use the batch
operator over the lakehouse table when that column matters.)
"""

from __future__ import annotations

import uuid as _uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate

_OUT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("n", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("e1", StringType(), True),
        StructField("e2", StringType(), True),
    ]
)


def path_deltas(events: DataFrame, depth: int = 3) -> DataFrame:
    """events(user_id, ts, event_id, event_type) → (path, n) trigram deltas
    per micro-batch. Works on streaming and batch frames alike (the
    twin-agreement test runs it per-file)."""
    if depth != 3:
        raise ValueError("the stateful census carries a 2-event tail; depth is fixed at 3")

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(e), str(ty))
                for t, e, ty in zip(pdf["ts"], pdf["event_id"], pdf["event_type"])
            )
        rows.sort(key=lambda r: (r[0], r[1]))
        e1, e2 = state.get if state.exists else (None, None)
        seq = [e for e in (e1, e2) if e is not None] + [ty for _, _, ty in rows]
        counts: dict[str, int] = {}
        # the stored tail is at most 2 events, so EVERY 3-window of seq ends
        # at a new event — start at 0 (boundary-crossing windows included),
        # nothing double-counts across batches
        for j in range(len(seq) - 2):
            p = f"{seq[j]}>{seq[j + 1]}>{seq[j + 2]}"
            counts[p] = counts.get(p, 0) + 1
        tail = seq[-2:]
        state.update((tail[0] if len(tail) == 2 else None, tail[-1] if tail else None))
        if not counts:
            yield pd.DataFrame({"path": pd.Series([], dtype="object"), "n": pd.Series([], dtype="int64")})
            return
        yield pd.DataFrame(
            {"path": list(counts), "n": [counts[p] for p in counts]}
        )

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class StreamingPathCensus:
    """Corpus-wide 3-step path counts maintained over an event stream."""

    def __init__(self, spark: SparkSession, location: str) -> None:
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["path"],
            aggs={"n_occurrences": ("sum", "CAST(n AS BIGINT)")},
            agg_types={"n_occurrences": "bigint"},
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        ckpt = checkpoint or f"/tmp/path_census_ckpt_{_uuid.uuid4().hex}"
        ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex
        deltas = path_deltas(stream)

        def fold(batch_df: DataFrame, batch_id: int) -> None:
            self.mv.refresh(
                batch_df, idempotency_key=f"paths:{ckpt_id}:{batch_id}"
            )

        writer = deltas.writeStream.foreachBatch(fold).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def census(self) -> DataFrame:
        return (
            self.mv.read()
            .select("path", "n_occurrences")
            .orderBy(F.desc("n_occurrences"), F.asc("path"))
        )
