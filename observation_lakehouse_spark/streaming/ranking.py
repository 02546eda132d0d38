"""Live arena ratings: a streaming twin of the Bradley–Terry operator.

The MM iteration's sufficient statistic is just the ordered-pair win-count
table — ideal streaming state: battles fold into an exactly-once
:class:`~observation_lakehouse_spark.plans.incremental.IncrementalAggregate`
keyed by (item_a, item_b), and ``report()`` runs the SAME count-level math
as the batch operator (:func:`~observation_lakehouse_spark.operators.
ranking.bradley_terry_from_pairs`), so the live ratings are bit-identical
to ``bradley_terry(all delivered battles)`` by construction — the
chi2/StreamingChi2Monitor seam pattern.

State is O(observed item pairs). Arena item sets are small by nature
(models / implementations under comparison), but the monitor still
enforces ``max_pairs`` at report time so an id-explosion upstream (e.g. a
session id leaking into the item column) fails loudly instead of growing
state without bound — the drift monitors' bounded-state discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

__all__ = ["StreamingArenaRatings"]


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the RDD blocks behind an eagerly localCheckpoint-ed frame.

    ``DataFrame.unpersist`` is a CacheManager operation and leaves the
    checkpoint's persisted RDD resident until driver GC collects the
    wrapper; unpersisting the LogicalRDD's underlying RDD frees it now.
    The frame becomes unrecomputable afterwards — only call this on a
    frame whose consumers are done (here: the previous report)."""
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — a dead context must not fail a report
        pass


class StreamingArenaRatings:
    def __init__(
        self,
        spark: SparkSession,
        location: str,
        winner_col: str = "winner_id",
        loser_col: str = "loser_id",
        max_pairs: int = 100_000,
    ) -> None:
        if max_pairs < 1:
            raise ValueError("max_pairs must be >= 1")
        self.spark = spark
        self.winner_col = winner_col
        self.loser_col = loser_col
        self.max_pairs = int(max_pairs)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["a", "b"],
            key_types=["string", "string"],
            aggs={"n_ab": ("count", "1")},
            agg_types={"n_ab": "bigint"},
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        w, l = self.winner_col, self.loser_col
        rows = stream.filter(
            F.col(w).isNotNull() & F.col(l).isNotNull() & (F.col(w) != F.col(l))
        ).select(
            F.col(w).cast("string").alias("a"), F.col(l).cast("string").alias("b")
        )
        return stream_mv_refresh(
            self.mv, rows, checkpoint=checkpoint, available_now=available_now
        )

    def report(self, n_rounds: int = 4) -> DataFrame:
        """(item, rating_micro, wins, battles) over every battle delivered
        so far — exactly the batch operator on the same log."""
        from observation_lakehouse_spark.operators.ranking import (
            bradley_terry_from_pairs,
        )

        state = self.mv.read()
        n_pairs = state.count()
        if n_pairs > self.max_pairs:
            raise ValueError(
                f"ratings state holds {n_pairs} ordered pairs > max_pairs="
                f"{self.max_pairs}; the item column is exploding — bucket or "
                "filter it upstream"
            )
        # The report is item-sized (max_pairs bounds it), so materialize it
        # INSIDE the call and release the state snapshot before returning
        # (r11 ADVICE: the previous release-on-next-report scheme poisoned
        # a still-held report N frame — its post-loop totals lazily re-read
        # the snapshot — when report N+1 released it). The returned frame
        # is a local table with no checkpoint lineage: nothing accumulates
        # across calls and every returned report stays actionable forever.
        raw = state.select("a", "b", "n_ab").localCheckpoint(eager=True)
        try:
            rep = bradley_terry_from_pairs(raw, n_rounds=n_rounds)
            schema = rep.schema
            rows = rep.collect()
        finally:
            _release_local_checkpoint(raw)
        return self.spark.createDataFrame(rows, schema)
