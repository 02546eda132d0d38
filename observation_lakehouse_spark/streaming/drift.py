"""Streaming PSI drift monitor — the continuous twin of
:func:`~observation_lakehouse_spark.operators.audit.psi_drift`.

The deployment shape of drift monitoring: the REFERENCE histogram is frozen
once (the distribution the model/filters were tuned on — K small rows), and
the live side's per-bin counts are maintained over the event stream,
exactly-once under the (checkpoint, batch_id) protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
(a replayed fold would inflate bins and manufacture drift). ``report()``
derives the batch operator's exact per-bin decomposition — shares, single-
quotient micro-nat log-ratios, contributions — over the union of reference
and observed bins, so the live report EQUALS ``psi_drift(ref, delivered)``
bit-for-bit (pinned by tests/test_stream_drift.py). State is O(n_bins)
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

MICRO = 1_000_000


class StreamingPsiMonitor:
    """Per-bin current-side counts vs a frozen reference histogram."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ref: DataFrame,
        value_col: str = "value",
        lo: float = 0.0,
        hi: float = 1.0,
        n_bins: int = 10,
    ) -> None:
        if n_bins < 1 or not hi > lo:
            raise ValueError("need n_bins >= 1 and hi > lo")
        self.spark = spark
        self.value_col = value_col
        self.n_bins = int(n_bins)
        self.lo_u = int(round(lo * MICRO))
        self.hi_u = int(round(hi * MICRO))
        self.span = max(1, (self.hi_u - self.lo_u) // self.n_bins)
        # freeze the reference histogram NOW — K rows collected once; the
        # monitor's whole point is a fixed yardstick
        self.ref_bins: list[tuple[int, int]] = sorted(
            (int(r["bin"]), int(r["n"]))
            for r in ref.select(self._bin_expr(value_col).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        self.n_ref_total = sum(n for _, n in self.ref_bins)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["bin"],
            key_types=["bigint"],
            aggs={"n_cur": ("count", "1")},
            agg_types={"n_cur": "bigint"},
        )

    def _bin_expr(self, col: str):
        v_micro = (F.col(col).cast("decimal(18,6)") * MICRO).cast("long")
        return F.least(
            F.lit(self.n_bins - 1),
            F.floor(
                (
                    F.least(F.lit(self.hi_u - 1), F.greatest(F.lit(self.lo_u), v_micro))
                    - F.lit(self.lo_u)
                )
                / F.lit(self.span)
            ),
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        return stream_mv_refresh(
            self.mv,
            stream.select(self._bin_expr(self.value_col).alias("bin")),
            checkpoint=checkpoint,
            available_now=available_now,
        )

    def report(self) -> DataFrame:
        """psi_drift's exact per-bin rows over (frozen reference, delivered
        stream): (bin, n_ref, n_cur, p_ppm, q_ppm, lr_micro_nats,
        psi_contrib_micro), ordered by bin. The PSI is the contribution
        sum."""
        ref_df = self.spark.createDataFrame(
            self.ref_bins or [], "bin bigint, _nr bigint"
        )
        cur = self.mv.read().select("bin", F.col("n_cur").alias("_nc"))
        merged = (
            ref_df.join(cur, "bin", "full_outer")
            .select(
                "bin",
                F.coalesce("_nr", F.lit(0)).alias("n_ref"),
                F.coalesce("_nc", F.lit(0)).alias("n_cur"),
            )
        )
        total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        k = self.n_bins
        wb = merged.withColumn("_NR", F.sum("n_ref").over(total)).withColumn(
            "_NC", F.sum("n_cur").over(total)
        )
        return (
            wb.select(
                "bin",
                "n_ref",
                "n_cur",
                F.expr(f"((n_ref + 1) * {MICRO}) div (_NR + {k})").alias("p_ppm"),
                F.expr(f"((n_cur + 1) * {MICRO}) div (_NC + {k})").alias("q_ppm"),
                F.round(
                    F.log(
                        F.expr(
                            f"CAST(CAST(n_ref + 1 AS DECIMAL(38,0)) * (_NC + {k}) AS DOUBLE)"
                        )
                        / F.expr(
                            f"CAST(CAST(n_cur + 1 AS DECIMAL(38,0)) * (_NR + {k}) AS DOUBLE)"
                        )
                    )
                    * 1_000_000.0
                )
                .cast("long")
                .alias("lr_micro_nats"),
            )
            .select(
                "bin",
                "n_ref",
                "n_cur",
                "p_ppm",
                "q_ppm",
                "lr_micro_nats",
                F.expr(f"((p_ppm - q_ppm) * lr_micro_nats) div {MICRO}").alias(
                    "psi_contrib_micro"
                ),
            )
            .orderBy("bin")
        )
