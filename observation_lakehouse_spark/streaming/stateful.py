"""Custom stateful streaming operator: timeout-based sessionization.

The brief's third streaming capability (after checkpointed ingestion and
watermarked windows): arbitrary per-key state via ``applyInPandasWithState``.
Sessionization is the canonical case no built-in window covers — a session
ends after ``gap`` of inactivity, so its extent is data-dependent.

Semantics: events keyed by ``user_id``; consecutive events closer than
``gap_ms`` belong to one session. A session row is emitted when the state
times out (processing-time timeout after the key goes quiet) or when the
stream sees a gap-exceeding event (the prior session closes immediately).

State per key = (session_start, last_ts, n_events) — three longs, regardless
of traffic volume, so state size is O(active keys): the property that makes
this safe at 100 TB/day event rates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", LongType(), True),
        StructField("session_end", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType(), True),
        StructField("last_ts", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def sessionize(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """events(user_id long, ts long[ms]) stream → closed-session rows.

    Works on streaming AND batch frames (Spark runs the same function per
    group in batch mode with a no-timeout state) — which is how the tests
    verify it without wall-clock waits.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts"])
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
