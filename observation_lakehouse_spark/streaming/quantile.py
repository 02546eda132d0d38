"""Streaming quantile monitor — per-key value quantiles maintained
continuously over an append stream via a mergeable fixed-bin histogram.

Exact streaming quantiles need the full value history; production monitors
keep a SKETCH. The simplest sketch with a hard error bound is the fixed-bin
equi-width histogram: counts of disjoint streams add bin-wise (the same
mergeability that makes Count-Min work, streaming/cms.py), so maintenance is
an :class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed on (key, bin) under the exactly-once idempotency protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
(a replayed fold would inflate counts — same corruption class as a replayed
MV delta, prevented the same way).

The quantile answer reads ONLY the state table: per key, the q-quantile
estimate is the upper edge of the first bin whose cumulative count reaches
``ceil(q × total)`` — error bounded by one bin width, one-sided (never
under-reports), independent of how many values streamed past. State is
O(keys × n_bins) forever.

At 100 TB/day this is the working shape: each micro-batch folds at
O(batch rows) map-side-combinable cost; the read path windows over ≤
``n_bins`` rows per key — never the stream history. (For long-tailed value
domains swap the bin rule for log-width bins; the protocol is unchanged.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh


def histogram_bin(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Equi-width bin index with edge clamping: values below ``lo`` land in
    bin 0, values at/above ``hi`` in bin ``n_bins - 1`` — the estimate
    degrades at the clamped edges instead of dropping data. One codegen'd
    expression, shared verbatim by the batch twin so stream state and a
    batch backfill land in identical bins."""
    step = (hi - lo) / n_bins
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(step)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def value_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Batch twin: the (key, bin, c) histogram the streaming monitor's state
    must equal over the same delivered rows (pinned by
    tests/test_stream_quantile.py)."""
    return (
        df.select(
            F.col(key_col).alias("k"),
            histogram_bin(F.col(value_col), lo, hi, n_bins).alias("bin"),
        )
        .groupBy("k", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


class StreamingQuantileMonitor:
    """Per-key quantile estimates over an append stream of (key, value)."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        key_col: str = "event_type",
        value_col: str = "value",
        lo: float = 0.0,
        hi: float = 1000.0,
        n_bins: int = 256,
    ) -> None:
        if n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        self.key_col, self.value_col = key_col, value_col
        self.lo, self.hi, self.n_bins = float(lo), float(hi), int(n_bins)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["k", "bin"],
            key_types=["string", "bigint"],
            aggs={"c": ("sum", "CAST(1 AS BIGINT)")},
            agg_types={"c": "bigint"},
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.key_col).cast("string").alias("k"),
            histogram_bin(F.col(self.value_col), self.lo, self.hi, self.n_bins).alias(
                "bin"
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
            self._increments(stream),
            checkpoint=checkpoint,
            available_now=available_now,
        )

    def hist(self) -> DataFrame:
        return self.mv.read().select("k", "bin", "c")

    def quantiles(self, qs: tuple[float, ...] = (0.5, 0.95, 0.99)) -> DataFrame:
        """(k, q, est, n) per key and requested quantile: ``est`` is the
        upper edge of the first bin whose cumulative count reaches
        ceil(q × n) — a one-sided estimate within one bin width of the true
        quantile. The rank threshold is exact integer arithmetic on a
        parts-per-million rendering of q (no float rank boundary)."""
        step = (self.hi - self.lo) / self.n_bins
        h = self.hist()
        w = Window.partitionBy("k").orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = h.withColumn("cum", F.sum("c").over(w))
        tot = h.groupBy("k").agg(F.sum("c").alias("n"))
        probes = tot.select(
            "k",
            "n",
            F.explode(
                F.array(*[F.lit(int(round(q * 1_000_000))) for q in qs])
            ).alias("q_ppm"),
        ).withColumn(
            "rank", F.expr("(n * q_ppm + 999999) DIV 1000000")
        )
        return (
            probes.join(cum, "k")
            .filter(F.col("cum") >= F.col("rank"))
            .groupBy("k", "q_ppm", "n")
            .agg(F.min("bin").alias("bin"))
            .select(
                "k",
                (F.col("q_ppm").cast("double") / 1e6).alias("q"),
                (F.lit(self.lo) + (F.col("bin") + 1) * F.lit(step)).alias("est"),
                "n",
            )
            .orderBy("k", "q")
        )
