"""Stateful streaming counter rollup — the continuous twin of the batch
``operators.timeseries.counter_increase`` (Prometheus ``increase()``).

Per key the running (n_samples, n_resets, total_increase) is carried as four
longs via ``applyInPandasWithState`` and re-emitted every micro-batch the key
appears in (a running snapshot appended per batch — file sinks are
append-only, so update-style delivery is expressed as snapshot rows the
reader reduces by max n_samples): O(active keys) state regardless of event
volume — the property that keeps the operator viable at 100 TB/day rates.

Determinism contract: values are folded in exact integer MICRO-UNITS.  A
double is converted with ``Decimal(repr(v))`` (the shortest round-trip
decimal — the same value Spark's ``CAST(double AS DECIMAL)`` takes via Java's
``BigDecimal.valueOf``) quantized half-up to 6 dp, so the stream's arithmetic
is bit-identical to the batch operator's DECIMAL(18,6) pipeline; the
twin-agreement test (tests/test_streaming.py) holds exactly, not
approximately.

Ordering: events are sorted by (ts, order_col) within each micro-batch;
cross-batch order is the file/source arrival order. A counter sample that
arrives a batch late behind a later sample is folded out of order — the same
at-least-once-delivery caveat the ingestion path documents, stated rather
than papered over (bound it upstream with a watermark + sorted repartition).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

COUNTER_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("n_resets", LongType(), True),
        StructField("total_increase", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_v_u", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("n_resets", LongType(), True),
        StructField("total_u", LongType(), True),
    ]
)

_MICRO = Decimal("0.000001")


def _micro(v: float) -> int:
    return int(Decimal(repr(v)).quantize(_MICRO, rounding=ROUND_HALF_UP) * 1_000_000)


def counter_rollup(events: DataFrame) -> DataFrame:
    """events(user_id long, ts long, event_id long, value double) stream →
    one running-total row per key per micro-batch it appears in.

    Works on streaming AND batch frames (Spark runs the same fold per group
    in batch mode), which is how the twin-agreement test verifies it against
    the oracle-checked batch operator without wall-clock waits.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(e), float(v))
                for t, e, v in zip(pdf["ts"], pdf["event_id"], pdf["value"])
            )
        rows.sort(key=lambda r: (r[0], r[1]))
        last_v_u, n, resets, total_u = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        for _, _, v in rows:
            v_u = _micro(v)
            if last_v_u is not None:
                if v_u >= last_v_u:
                    total_u += v_u - last_v_u
                else:  # counter restarted: the whole reading is new increase
                    total_u += v_u
                    resets += 1
            last_v_u = v_u
            n += 1
        state.update((last_v_u, n, resets, total_u))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_samples": [n],
                "n_resets": [resets],
                "total_increase": [total_u / 1_000_000],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=COUNTER_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
