"""Streaming last-touch attribution — the continuous twin of the batch
``operators.behavior.last_touch_attribution``.

State per user is ONE pending touch: the (ts, type) of the most recent
non-conversion event seen so far — O(active users) regardless of event
volume. Each micro-batch, the user's new events are sorted by (ts,
event_id); conversions credit the in-window touch (stored or earlier in the
same batch, ties on equal ts broken lexicographically on type exactly like
the batch operator's padded-string MAX — and a touch at the conversion's own
timestamp does NOT count, matching the batch RANGE frame's ``1 PRECEDING``
bound); every non-conversion event replaces the pending touch.

Revenue folds in integer MICRO-UNITS (the ``Decimal(repr(v))`` shortest
round-trip quantization streaming/counter.py proved bit-identical to the
batch DECIMAL pipeline), so the census equals the batch operator exactly,
not approximately. Per-batch (touch_type, n, revenue_u) deltas fold into an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
under (checkpoint, batch_id) idempotency keys — replay-safe exactly-once.

Ordering caveat (stated, same as streaming/counter.py): cross-batch order is
source arrival order; a touch arriving a batch behind a conversion it should
have preceded is attributed as 'unattributed' — bound disorder upstream with
a watermark + sorted repartition.
"""

from __future__ import annotations

import uuid as _uuid
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
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
        StructField("touch_type", StringType(), False),
        StructField("n", LongType(), False),
        StructField("revenue_u", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("touch_ts", LongType(), True),
        StructField("touch_type", StringType(), True),
    ]
)

# the batch operator sums CAST(value AS DECIMAL(18,2)) — per-value HALF_UP
# quantization at 2 dp — so the stream quantizes identically before scaling
# to micro-units; a 6 dp quantization would diverge on >2 dp inputs
_CENT = Decimal("0.01")


def _micro(v: float) -> int:
    return int(Decimal(repr(v)).quantize(_CENT, rounding=ROUND_HALF_UP) * 1_000_000)


def attribution_deltas(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """events(user_id, ts, event_id, event_type, value) → per-batch
    (touch_type, n, revenue_u) attribution deltas."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[int, int, str, float]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(e), str(ty), float(v))
                for t, e, ty, v in zip(
                    pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["value"]
                )
            )
        rows.sort(key=lambda r: (r[0], r[1]))
        touch_ts, touch_type = state.get if state.exists else (None, None)
        out: dict[str, tuple[int, int]] = {}
        for ts, _, ty, v in rows:
            if ty == conversion_type:
                if (
                    touch_ts is not None
                    and touch_ts < ts  # equal-ts touch excluded (1 PRECEDING)
                    and ts - touch_ts <= window_us
                ):
                    credit = touch_type
                else:
                    credit = "unattributed"
                n, r = out.get(credit, (0, 0))
                out[credit] = (n + 1, r + _micro(v))
            else:
                # ties on equal ts: keep the lexicographically LARGER type —
                # the batch operator's MAX over padded (ts, type) strings
                if (
                    touch_ts is None
                    or ts > touch_ts
                    or (ts == touch_ts and ty > (touch_type or ""))
                ):
                    touch_ts, touch_type = ts, ty
        state.update((touch_ts, touch_type))
        if not out:
            yield pd.DataFrame(
                {
                    "touch_type": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "revenue_u": pd.Series([], dtype="int64"),
                }
            )
            return
        yield pd.DataFrame(
            {
                "touch_type": list(out),
                "n": [out[k][0] for k in out],
                "revenue_u": [out[k][1] for k in out],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class StreamingAttribution:
    """Last-touch revenue attribution maintained over an event stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        conversion_type: str = "purchase",
        window_us: int = 7 * 86_400_000_000,
    ) -> None:
        self.conversion_type = conversion_type
        self.window_us = int(window_us)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["touch_type"],
            aggs={
                "n_conversions": ("sum", "CAST(n AS BIGINT)"),
                "revenue_u": ("sum", "CAST(revenue_u AS BIGINT)"),
            },
            agg_types={"n_conversions": "bigint", "revenue_u": "bigint"},
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        ckpt = checkpoint or f"/tmp/attribution_ckpt_{_uuid.uuid4().hex}"
        ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex
        deltas = attribution_deltas(stream, self.conversion_type, self.window_us)

        def fold(batch_df: DataFrame, batch_id: int) -> None:
            self.mv.refresh(batch_df, idempotency_key=f"attr:{ckpt_id}:{batch_id}")

        writer = deltas.writeStream.foreachBatch(fold).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def report(self) -> DataFrame:
        """(touch_type, n_conversions, revenue) — the batch operator's
        output shape, revenue rendered from the exact micro-unit sum."""
        return (
            self.mv.read()
            .select(
                "touch_type",
                "n_conversions",
                F.round(F.col("revenue_u").cast("double") / 1e6, 2).alias("revenue"),
            )
            .orderBy("touch_type")
        )
