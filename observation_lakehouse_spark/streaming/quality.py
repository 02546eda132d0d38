"""Streaming data-quality monitor — the constraint audit maintained
continuously over an append stream.

The batch gate (operators/audit.py:constraint_audit) answers "does this
corpus snapshot conform?"; a 100 TB ingest wants the same answer for the
LIVE table without rescanning it per batch. Every constraint family the
batch audit supports decomposes into distributive partials (Gray et al.,
ICDE'96): a conformance RATIO is a pair of mergeable sums (conforming
rows, total rows) and a bound check is a mergeable MIN — so the monitor is
a thin composition of :class:`IncrementalAggregate` (keys-sized decimal
state, atomic versioned commits) and :func:`stream_mv_refresh`
(exactly-once per-batch folding keyed on (checkpoint, batch_id)). Reading
current metrics is a scan of ONE state row; refresh cost is O(batch).

Replayed batches are recognized inside the MV commit protocol and skipped
— a double-fold would inflate both sums of a ratio (possibly silently
keeping it at 1.0), which is exactly the corruption the idempotency key
exists to prevent (streaming/mv_refresh.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.operators.audit import MICRO
from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

_SCOPE = "all"


class StreamingConstraintMonitor:
    """Cumulative constraint metrics over everything a stream delivered.

    ``ratio_checks`` maps check name → SQL row predicate; the metric is the
    exact parts-per-million of rows satisfying it, passing at 1e6 (full
    conformance). ``min_checks`` maps check name → SQL numeric expression;
    the metric is the cumulative minimum in micro-units, passing when > 0.
    ``metrics()`` returns (check, metric_micro, passed) — the same contract
    as the batch audit, so the two are twin-testable on identical rows.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ratio_checks: dict[str, str],
        min_checks: dict[str, str] | None = None,
    ) -> None:
        self.ratio_checks = dict(ratio_checks)
        self.min_checks = dict(min_checks or {})
        aggs: dict[str, tuple[str, str]] = {"_den": ("count", "1")}
        for name, cond in self.ratio_checks.items():
            aggs[f"_r_{name}"] = (
                "sum",
                f"CAST(CASE WHEN ({cond}) THEN 1 ELSE 0 END AS DECIMAL(38,6))",
            )
        for name, expr in self.min_checks.items():
            aggs[f"_m_{name}"] = ("min", f"CAST(({expr}) AS DECIMAL(38,6))")
        self.mv = IncrementalAggregate(
            spark, location, keys=["_scope"], aggs=aggs
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Fold the stream into the metric state, one micro-batch at a time."""
        scoped = stream.withColumn("_scope", F.lit(_SCOPE))
        return stream_mv_refresh(
            self.mv, scoped, checkpoint=checkpoint, available_now=available_now
        )

    def metrics(self) -> DataFrame:
        """(check, metric_micro, passed) derived from the one-row state —
        integer micro-unit math identical to the batch audit's, so the twin
        test compares values verbatim."""
        state = self.mv.read()
        rows = []
        for name in sorted(self.ratio_checks):
            num = F.col(f"_r_{name}").cast("decimal(38,0)")
            den = F.col("_den").cast("decimal(38,0)")
            metric = F.floor(F.lit(MICRO).cast("decimal(38,0)") * num / den).cast("long")
            rows.append(
                F.struct(
                    F.lit(name).alias("check"),
                    metric.alias("metric_micro"),
                    (metric == MICRO).alias("passed"),
                )
            )
        for name in sorted(self.min_checks):
            metric = F.round(
                F.col(f"_m_{name}").cast("double") * F.lit(1_000_000.0)
            ).cast("long")
            rows.append(
                F.struct(
                    F.lit(name).alias("check"),
                    metric.alias("metric_micro"),
                    (metric > 0).alias("passed"),
                )
            )
        return (
            state.filter(F.col("_scope") == _SCOPE)
            .select(F.explode(F.array(*rows)).alias("c"))
            .select("c.check", "c.metric_micro", "c.passed")
            .orderBy("check")
        )
