"""Streaming token-budget monitor — the continuous twin of
:func:`~observation_lakehouse_spark.operators.selection.token_budget_select`.

The batch operator answers "which documents fill the token budget best"
with a two-phase threshold refinement whose ONLY corpus-wide aggregate is
the per-quality-bin token mass. That histogram is bin-wise mergeable
(disjoint batches ADD, the same property Count-Min and the quantile
monitor's fixed-bin histogram exploit), so a selection pipeline ingesting
documents continuously can maintain it as an
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed on the quality bin, under the exactly-once (checkpoint, batch_id)
idempotency protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
— a replayed fold would inflate token mass and silently move the cut,
the same corruption class as a replayed MV delta, prevented the same way.

The monitoring answer reads ONLY the state table (≤ ``n_bins`` rows): the
current budget ``B = num·total div den``, the boundary quality bin (every
bin above it fits entirely), and the leftover budget inside it — i.e.
phase 1 of the batch operator, always current. The phase-2 within-bin
refinement stays a batch concern at selection time: it touches one bin's
documents, and the monitor tells it WHICH bin before any document is
scanned. State is O(n_bins) forever; each micro-batch folds at
O(batch rows) map-side-combinable cost.

The reference has no streaming surface at all (its ingest is batch
PyIceberg appends, /root/reference/olake/ingest/arena.py); this extends the
same selection semantics to the continuous-ingest shape a 100 TB pipeline
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh


def bin_token_mass(
    df: DataFrame,
    quality_micro_col: str = "quality_micro",
    tokens_col: str = "n_tokens",
    n_bins: int = 1000,
    quality_micro_max: int = 10_000_000,
) -> DataFrame:
    """Batch twin: the (_bin, mass, docs) histogram the streaming monitor's
    state must equal over the same delivered rows (pinned by
    tests/test_stream_token_budget.py). The bin rule is the EXACT integer
    expression ``token_budget_select`` uses, so the monitor's boundary bin
    is bit-identical to the batch operator's ``_cut_bin``."""
    span = quality_micro_max // n_bins
    return (
        df.select(
            F.expr(f"CAST({quality_micro_col} AS BIGINT) div {int(span)}").alias(
                "_bin"
            ),
            F.col(tokens_col).cast("long").alias("_tok"),
        )
        .groupBy("_bin")
        .agg(F.sum("_tok").alias("mass"), F.count(F.lit(1)).alias("docs"))
    )


class StreamingTokenBudgetMonitor:
    """Per-quality-bin token-mass state over an append document stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        quality_micro_col: str = "quality_micro",
        tokens_col: str = "n_tokens",
        n_bins: int = 1000,
        quality_micro_max: int = 10_000_000,
    ) -> None:
        if n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        self.quality_micro_col = quality_micro_col
        self.tokens_col = tokens_col
        self.n_bins = int(n_bins)
        self.quality_micro_max = int(quality_micro_max)
        self.span = self.quality_micro_max // self.n_bins
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["_bin"],
            key_types=["bigint"],
            aggs={
                "mass": ("sum", "_tok"),
                "docs": ("sum", "CAST(1 AS BIGINT)"),
            },
            agg_types={"mass": "bigint", "docs": "bigint"},
        )

    def _increments(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.expr(
                f"CAST({self.quality_micro_col} AS BIGINT) div {self.span}"
            ).alias("_bin"),
            F.col(self.tokens_col).cast("long").alias("_tok"),
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
        return self.mv.read().select("_bin", "mass", "docs")

    def cutoff(self, budget_num: int = 3, budget_den: int = 5) -> DataFrame:
        """One row: the CURRENT selection boundary under budget
        ``B = budget_num·total div budget_den`` —

        - ``cut_bin``: highest quality bin whose top-down cumulative token
          mass exceeds B (NULL when everything fits: total ≤ B);
        - ``cut_quality_micro``: that bin's LOWER quality edge — every
          document strictly above it is kept outright, exactly the bins
          the batch operator keeps by scan-level filter;
        - ``remaining_tokens``: leftover budget inside the boundary bin,
          what the batch phase-2 refinement distributes within that bin;
        - ``budget_tokens`` / ``total_tokens``: the budget arithmetic, all
          exact integers.

        Windows run over ≤ n_bins state rows — never document history.
        """
        h = self.bins()
        w_b = Window.orderBy(F.desc("_bin")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        binned = h.select(
            "_bin",
            "mass",
            F.sum("mass").over(w_b).alias("_cum"),
            F.sum("mass").over(w_all).alias("_total"),
        ).withColumn(
            "_budget",
            F.expr(
                f"CAST({int(budget_num)} * _total AS BIGINT) div {int(budget_den)}"
            ),
        )
        over = (
            binned.filter(F.col("_cum") > F.col("_budget"))
            .orderBy(F.desc("_bin"))
            .limit(1)
            .select(
                F.col("_bin").alias("cut_bin"),
                (F.col("_bin") * F.lit(self.span)).alias("cut_quality_micro"),
                (F.col("_budget") - (F.col("_cum") - F.col("mass"))).alias(
                    "remaining_tokens"
                ),
                F.col("_budget").alias("budget_tokens"),
                F.col("_total").alias("total_tokens"),
            )
        )
        # everything-fits case: emit the totals with a NULL boundary
        fits = (
            binned.groupBy()
            .agg(F.max("_budget").alias("budget_tokens"), F.max("_total").alias("total_tokens"))
            .filter(F.col("total_tokens") <= F.col("budget_tokens"))
            .select(
                F.lit(None).cast("bigint").alias("cut_bin"),
                F.lit(None).cast("bigint").alias("cut_quality_micro"),
                F.lit(None).cast("bigint").alias("remaining_tokens"),
                "budget_tokens",
                "total_tokens",
            )
        )
        return over.unionByName(fits)
