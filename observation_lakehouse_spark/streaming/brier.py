"""Streaming Brier-decomposition monitor — the continuous twin of
:func:`~observation_lakehouse_spark.operators.evaluation.brier_decomposition`.

The decomposition's per-bin inputs are four mergeable sums — (count,
Σ confidence_ppm, Σ positives, Σ (p−1e6·y)²) per confidence bin — so the
whole Murphy attribution folds into an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed on the bin, exactly-once under the (checkpoint, batch_id) protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`.
The squared-error sum is stored as DECIMAL(38,0) (the batch operator's own
carrier), so state never overflows regardless of per-bin row counts.

``report()`` derives the batch operator's exact single-row output —
(n, brier_ppm, reliability_ppm, resolution_ppm, uncertainty_ppm), identical
integer divisions — from ≤ ``n_bins`` state rows, so the live attribution
over the delivered rows EQUALS the batch result bit-for-bit (pinned by
tests/test_stream_brier.py). State is O(n_bins) forever: the drift monitor a
scorer deployment keeps next to the calibration one (ECE says "the gap
grew"; this says whether the Brier damage is miscalibration or lost
discrimination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

PPM = 1_000_000


class StreamingBrierMonitor:
    """Per-confidence-bin Brier state over a scored event stream."""

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
                "bsq": ("sum", "_bsq"),
            },
            agg_types={
                "n": "bigint",
                "sum_p": "bigint",
                "sum_y": "bigint",
                "bsq": "decimal(38,0)",
            },
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        p_ppm = F.round(F.col(self.prob_col).cast("decimal(18,6)") * PPM).cast(
            "long"
        )
        y = F.col(self.label_col).cast("long")
        return df.select(
            F.floor(F.least(F.lit(PPM - 1), p_ppm) / F.lit(self.span)).alias("bin"),
            p_ppm.alias("_p"),
            y.alias("_y"),
            ((p_ppm - PPM * y) * (p_ppm - PPM * y))
            .cast("decimal(38,0)")
            .alias("_bsq"),
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
        return self.mv.read().select("bin", "n", "sum_p", "sum_y", "bsq")

    def report(self) -> DataFrame:
        """brier_decomposition's exact single row, derived from state with
        the batch operator's integer arithmetic — (n, brier_ppm,
        reliability_ppm, resolution_ppm, uncertainty_ppm)."""
        total = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        wb = (
            self.bins()
            .withColumnRenamed("sum_p", "S")
            .withColumnRenamed("sum_y", "Yk")
            .withColumn("_N", F.sum("n").over(total))
            .withColumn("_Y", F.sum("Yk").over(total))
            .select(
                "n",
                "bsq",
                "_N",
                "_Y",
                F.expr(
                    f"(CAST(S AS DECIMAL(38,0)) - CAST({PPM} * Yk AS DECIMAL(38,0)))"
                    f" * (CAST(S AS DECIMAL(38,0)) - CAST({PPM} * Yk AS DECIMAL(38,0)))"
                    f" div (CAST(n AS DECIMAL(38,0)) * {PPM})"
                ).alias("rel_t"),
                F.expr(
                    "(CAST(Yk AS DECIMAL(38,0)) * _N - CAST(n AS DECIMAL(38,0)) * _Y)"
                    " * (CAST(Yk AS DECIMAL(38,0)) * _N - CAST(n AS DECIMAL(38,0)) * _Y)"
                    f" * {PPM} div (CAST(n AS DECIMAL(38,0)) * _N * _N)"
                ).alias("res_t"),
            )
        )
        return wb.agg(
            F.sum("n").alias("n"),
            F.expr(
                f"SUM(bsq) div (FIRST(_N) * CAST({PPM} AS DECIMAL(38,0)))"
            ).alias("brier_ppm"),
            F.expr("SUM(rel_t) div FIRST(_N)").alias("reliability_ppm"),
            F.expr("SUM(res_t) div FIRST(_N)").alias("resolution_ppm"),
            F.expr(
                f"(CAST(FIRST(_Y) AS DECIMAL(38,0)) * (FIRST(_N) - FIRST(_Y)) * {PPM})"
                " div (CAST(FIRST(_N) AS DECIMAL(38,0)) * FIRST(_N))"
            ).alias("uncertainty_ppm"),
        )
