"""Streaming M4 maintainer — the dashboard-serving twin of
:func:`~observation_lakehouse_spark.operators.timeseries.m4_downsample`.

All four M4 anchors are MERGEABLE aggregates: min/max over the value
directly, first/last as lexicographic min/max over the packed (ts, value)
struct (the min over a union of batches is the min of the batch minima —
no window, no history). So a live dashboard's downsample table is an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed (key, bucket) under the exactly-once (checkpoint, batch_id) protocol
of :func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
— a replayed fold cannot corrupt min/max (idempotent), but WOULD inflate
``n_samples``, so the idempotency ledger matters here too.

State is O(keys × buckets-on-screen) and each micro-batch folds at
O(batch rows) map-side-combinable cost; the read path is a plain scan of
~4·width anchor rows per key — the pixel-exact chart M4 guarantees, always
current. (The reference has no streaming or downsampling surface; this is
the continuous-ingest shape of the serving-layer operator.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh


class StreamingM4:
    """Per-(key, bucket) M4 anchors maintained over an append stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        key_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        bucket_us: int = 21_600_000_000,
    ) -> None:
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.bucket_us = int(bucket_us)
        anchor = "struct<_ts:bigint,_v:double>"
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["k", "bucket_us"],
            key_types=["string", "bigint"],
            aggs={
                "v_min": ("min", "_v"),
                "v_max": ("max", "_v"),
                "first_anchor": ("min", "struct(_ts, _v)"),
                "last_anchor": ("max", "struct(_ts, _v)"),
                "n_samples": ("count", "1"),
            },
            agg_types={
                "v_min": "double",
                "v_max": "double",
                "first_anchor": anchor,
                "last_anchor": anchor,
                "n_samples": "bigint",
            },
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.key_col).cast("string").alias("k"),
            (
                F.expr(f"CAST({self.ts_col} AS BIGINT) div {self.bucket_us}")
                * F.lit(self.bucket_us)
            ).alias("bucket_us"),
            F.col(self.ts_col).cast("long").alias("_ts"),
            F.col(self.value_col).cast("double").alias("_v"),
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

    def anchors(self) -> DataFrame:
        """(k, bucket_us, v_min, v_max, v_first, v_last, n_samples) — the
        m4_downsample batch-twin shape, read straight off the state."""
        return self.mv.read().select(
            "k",
            "bucket_us",
            "v_min",
            "v_max",
            F.col("first_anchor._v").alias("v_first"),
            F.col("last_anchor._v").alias("v_last"),
            "n_samples",
        )
