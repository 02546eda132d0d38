"""Watermarked stream-stream interval join.

The reference is batch-only (SURVEY.md §2.9 ABSENT); this completes the
Structured Streaming surface (checkpointed ingestion → windowed aggregation →
stateful sessionization → stream-stream correlation). The canonical use: join
a stream of observation events with a second stream (e.g. CI results or
follow-up events) that arrives within a bounded delay.

Scale notes: the event-time bound plus BOTH-side watermarks let Spark expire
join state — without them a stream-stream join buffers both streams forever.
State size is O(events inside the delay window), independent of stream length,
and the join itself shuffles both sides on the key exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 seconds",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join rows sharing ``key`` where the right event lands within
    [left_ts, left_ts + max_delay]. Right columns are prefixed to avoid
    collisions. Works on batch frames too (withWatermark is a no-op there),
    which is how the semantics are unit-tested without wall-clock waits.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    rk, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop(rk)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static (batch) dimension table.

    Stream-static joins are stateless in Structured Streaming: each
    micro-batch joins against the CURRENT dimension snapshot, no watermark
    and no join state — the dimension is re-resolved per batch, so a table
    that is atomically replaced (e.g. an AtomicParquetTable snapshot path)
    picks up updates between batches. At scale the dimension side is the
    broadcast side; the stream never shuffles for the join.

    Only stream-side-preserving joins are allowed by Spark here (inner /
    left_outer / left_semi with the stream on the left); ``how`` is
    validated so misuse fails at build time, not mid-query.
    """
    allowed = {"inner", "left", "left_outer", "left_semi"}
    if how not in allowed:
        raise ValueError(
            f"stream-static join must preserve the stream side: how={how!r} "
            f"not in {sorted(allowed)}"
        )
    return stream.join(F.broadcast(dim), key, how)
