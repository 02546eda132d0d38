"""Streaming RFM maintainer — the continuous twin of
:func:`~observation_lakehouse_spark.operators.behavior.rfm_segments`.

All three RFM ingredients are mergeable per-user aggregates — recency =
MAX(ts), frequency = COUNT, monetary = SUM(value_micro) — so the user
profile table folds into an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed on the user, exactly-once under the (checkpoint, batch_id) protocol
of :func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
(a replayed fold would inflate frequency and monetary — same corruption
class as any replayed delta). ``segments()`` applies the batch operator's
exact NTILE scoring over the state table, so the live segmentation over
the delivered rows EQUALS the batch result bit-for-bit (pinned by
tests/test_stream_rfm.py).

State is O(users) — the same cardinality the batch operator reduces to
before its windows, kept current instead of recomputed; the scoring read
touches the user table only, never event history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh


class StreamingRFM:
    """Per-user recency/frequency/monetary state over an append stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        user_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> None:
        self.user_col, self.ts_col, self.value_col = user_col, ts_col, value_col
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["u"],
            key_types=["bigint"],
            aggs={
                "recency_ts": ("max", "_t"),
                "frequency": ("count", "1"),
                "monetary_micro": ("sum", "_vm"),
            },
            agg_types={
                "recency_ts": "bigint",
                "frequency": "bigint",
                "monetary_micro": "bigint",
            },
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.user_col).cast("long").alias("u"),
            F.col(self.ts_col).cast("long").alias("_t"),
            (F.col(self.value_col).cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("_vm"),
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        return stream_mv_refresh(
            self.mv,
            self._increments(stream),
            checkpoint=checkpoint,
            available_now=available_now,
        )

    def profiles(self) -> DataFrame:
        return self.mv.read().select(
            F.col("u").alias(self.user_col),
            "recency_ts",
            "frequency",
            "monetary_micro",
        )

    def segments(self, n_tiles: int = 5) -> DataFrame:
        """The rfm_segments output derived from state — the batch operator's
        OWN scoring back half (``score_rfm_profiles``: distributed rank +
        exact NTILE arithmetic over the same TOTAL (metric, user) orders),
        so ties split identically and the live segmentation equals a batch
        recompute bit-for-bit, with no unpartitioned window at any user
        cardinality. Caller releases the rank stages via
        ``release_cached``."""
        from observation_lakehouse_spark.operators.behavior import (
            score_rfm_profiles,
        )

        return score_rfm_profiles(
            self.profiles(), self.user_col, self.user_col, n_tiles
        )
