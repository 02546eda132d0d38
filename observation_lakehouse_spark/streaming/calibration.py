"""Streaming calibration monitor — the continuous twin of
:func:`~observation_lakehouse_spark.operators.evaluation.calibration_report`.

A scorer that gates documents drifts: the model is frozen but the corpus
moves, so yesterday's calibrated confidence is today's over-confidence.
The reliability diagram's per-bin inputs are three mergeable sums —
(count, Σ confidence_ppm, Σ positives) per confidence bin — so the whole
report folds into an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed on the bin, exactly-once under the (checkpoint, batch_id) protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
(a replayed fold would shift every mean and rate — the usual corruption
class, prevented the usual way).

``report()`` derives the batch operator's exact columns (mean confidence,
positive rate, gap, population-weighted ECE contribution — all integer ppm
with the same floor divisions) from ≤ ``n_bins`` state rows, so the live
report over the delivered rows EQUALS the batch report bit-for-bit (pinned
by tests/test_stream_calibration.py). State is O(n_bins) forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

PPM = 1_000_000


class StreamingCalibrationMonitor:
    """Per-confidence-bin calibration state over a scored event stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        prob_col: str = "p",
        label_col: str = "y",
        n_bins: int = 10,
    ) -> None:
        if n_bins < 1:
            raise ValueError("n_bins must be >= 1")
        self.prob_col, self.label_col = prob_col, label_col
        self.n_bins = int(n_bins)
        self.span = PPM // self.n_bins
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["bin"],
            key_types=["bigint"],
            aggs={
                "n": ("count", "1"),
                "sum_p": ("sum", "_p"),
                "sum_y": ("sum", "_y"),
            },
            agg_types={"n": "bigint", "sum_p": "bigint", "sum_y": "bigint"},
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        p_ppm = F.round(F.col(self.prob_col).cast("decimal(18,6)") * PPM).cast(
            "long"
        )
        return df.select(
            F.floor(F.least(F.lit(PPM - 1), p_ppm) / F.lit(self.span)).alias("bin"),
            p_ppm.alias("_p"),
            F.col(self.label_col).cast("long").alias("_y"),
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

    def bins(self) -> DataFrame:
        return self.mv.read().select("bin", "n", "sum_p", "sum_y")

    def report(self) -> DataFrame:
        """The calibration_report columns, derived from state with the batch
        operator's exact integer arithmetic — (bin, n, mean_conf_ppm,
        pos_rate_ppm, gap_ppm, ece_contrib_ppm), ordered by bin."""
        total = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return (
            self.bins()
            .select(
                "bin",
                "n",
                F.expr("sum_p div n").alias("mean_conf_ppm"),
                F.expr(f"(sum_y * {PPM}) div n").alias("pos_rate_ppm"),
            )
            .withColumn(
                "gap_ppm", F.abs(F.col("mean_conf_ppm") - F.col("pos_rate_ppm"))
            )
            .withColumn("_N", F.sum("n").over(total))
            .select(
                "bin",
                "n",
                "mean_conf_ppm",
                "pos_rate_ppm",
                "gap_ppm",
                F.expr("(n * gap_ppm) div _N").alias("ece_contrib_ppm"),
            )
            .orderBy("bin")
        )
