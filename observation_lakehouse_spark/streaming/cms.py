"""Streaming Count-Min sketch — corpus-wide term frequencies maintained
continuously over a document append stream.

The batch operator (operators/retrieval.py:cms_heavy_hitters) builds its
depth×width counter grid with a plain SUM — the textbook mergeability of
CMS (Cormode & Muthukrishnan '05: sketches of disjoint streams add
cell-wise). That makes the streaming twin a thin composition of the same
pieces every other streaming surface here uses: per batch, the document
text explodes to (row, bucket) increments and folds into an
:class:`IncrementalAggregate` keyed on the grid cell, under the
exactly-once idempotency protocol of :func:`stream_mv_refresh` (a replayed
fold would inflate counters — the same corruption class as a replayed MV
delta, prevented the same way).

State is O(depth × width) — a few KiB no matter how many tokens streamed
past — and answering a frequency probe reads ONLY the grid (min over
``depth`` cells per term), never the stream history. At 100 TB/day of
ingest this is the shape that works: counters absorb each micro-batch at
O(batch tokens) cost and the estimate path is a broadcast join against a
2048-row state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# Shared cell-hash: the STREAMING grid must land tokens in exactly the cells
# the batch operator uses, or the twin-agreement contract (and any batch
# backfill merged into the same state) silently breaks.
from observation_lakehouse_spark.operators.retrieval import _bucket
from observation_lakehouse_spark.functions.text import lower_tokens
from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh


class StreamingCountMinSketch:
    """CMS counter grid maintained over an append stream of documents.

    ``grid()`` returns the (i, b, c) state — cell-wise identical to the
    batch operator's grid over the same delivered documents (pinned by
    tests/test_stream_cms.py). ``estimate(terms)`` probes the grid:
    (term, cms_est) with the standard min-over-rows upper-bound estimate.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        depth: int = 4,
        width: int = 512,
        text_col: str = "text",
    ) -> None:
        self.depth = int(depth)
        self.width = int(width)
        self.text_col = text_col
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["i", "b"],
            key_types="bigint",
            aggs={"c": ("sum", "CAST(1 AS BIGINT)")},
            agg_types={"c": "bigint"},
        )

    def _increments(self, docs: DataFrame) -> DataFrame:
        """One (i, b) row per (token occurrence × grid row) — narrow ops
        only, so the same expression tree serves batch and stream inputs;
        the per-cell partial SUM happens inside the MV refresh."""
        rows = F.explode(F.array(*[F.lit(i) for i in range(self.depth)])).alias("i")
        return (
            docs.select(F.explode(lower_tokens(self.text_col)).alias("term"))
            .select("term", rows)
            .select(
                F.col("i").cast("long").alias("i"),
                _bucket(F.col("term"), F.col("i"), self.width).alias("b"),
            )
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

    def grid(self) -> DataFrame:
        return self.mv.read().select("i", "b", "c")

    def estimate(self, terms: list[str]) -> DataFrame:
        """(term, cms_est) for each probe term — min over its depth cells;
        terms absent from every cell estimate 0 (empty-intersection guard
        via the left join)."""
        spark = self.mv.table.spark
        probes = (
            spark.createDataFrame([(t,) for t in terms], "term string")
            .select(
                "term",
                F.explode(F.array(*[F.lit(i) for i in range(self.depth)])).alias("i"),
            )
            .select(
                "term",
                F.col("i").cast("long").alias("i"),
                _bucket(F.col("term"), F.col("i"), self.width).alias("b"),
            )
        )
        return (
            probes.join(F.broadcast(self.grid()), ["i", "b"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
            .orderBy("term")
        )
