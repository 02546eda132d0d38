"""Streaming ANN index maintenance — IVF cell assignments kept current over
an embedding append stream.

The batch ANN paths (`similarity.ivfadc_topk`, `semantic_dedup`, `knn_graph`)
all start from "which IVF cell does each vector live in?". Recomputing that
assignment per query re-scans the corpus; at ingest rates the Spark-first
answer is to maintain it as derived state, exactly once, as vectors arrive:

- ``assignments`` — an append-only :class:`~observation_lakehouse_spark.
  transaction.AtomicParquetTable` of (vec_id, centroid_id): each micro-batch
  assigns ONLY the delta via the exact-integer cell rule
  (:func:`~observation_lakehouse_spark.operators.similarity.ivf_assign_exact`
  — the same argmax the batch paths use, so maintained state and a batch
  recompute are bit-identical) and appends under a (checkpoint, batch_id)
  idempotency key.
- ``cell_stats`` — per-cell occupancy as an :class:`~observation_lakehouse_
  spark.plans.incremental.IncrementalAggregate`, the numbers an ANN planner
  reads to size nprobe / detect cell imbalance without touching vectors.

Two state updates per batch, each idempotent under its own key: a crash
between them replays the batch, the completed update recognizes its key and
no-ops, the other lands — both tables converge exactly-once (same protocol
argument as streaming/dedup.py's admission table).

At 100 TB: the per-batch cost is one delta-sized explode + broadcast-lit
join (the assignment aggregate), the occupancy state is K rows forever, and
a query-time cell probe reads the assignment table partition-pruned — the
corpus's raw vectors are never rescanned for index maintenance.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.operators.similarity import ivf_assign_exact
from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.transaction import AtomicParquetTable


class StreamingIvfIndex:
    """IVF cell assignments + occupancy maintained over an embedding stream."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        centroids: list[list[float]],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.centroids = [list(map(float, c)) for c in centroids]
        self.id_col, self.vec_col = id_col, vec_col
        self.assign_table = AtomicParquetTable(
            spark,
            f"{location}/assignments",
            schema=_parse_datatype_string(f"`{id_col}` bigint, `centroid_id` int"),
            # identity-partitioned by cell: a query-time probe of nprobe
            # cells reads exactly those partitions (hive pruning), never
            # the whole assignment table
            partition_by=("centroid_id",),
        )
        self.occ = IncrementalAggregate(
            spark,
            f"{location}/cell_stats",
            keys=["centroid_id"],
            key_types="int",
            aggs={"n_vectors": ("count", "1")},
        )

    def _assign(self, batch: DataFrame) -> DataFrame:
        return ivf_assign_exact(
            batch, self.centroids, id_col=self.id_col, vec_col=self.vec_col
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        ckpt = checkpoint or f"/tmp/ivf_index_ckpt_{_uuid.uuid4().hex}"
        ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex

        def fold(batch_df: DataFrame, batch_id: int) -> None:
            assigned = self._assign(batch_df)
            # local checkpoint: the assignment is consumed by BOTH state
            # updates — without the boundary the explode+argmax runs twice,
            # and a nondeterministic re-run between them could diverge.
            assigned = assigned.localCheckpoint(eager=True)
            self.assign_table.append(
                assigned, idempotency_key=f"ivfassign:{ckpt_id}:{batch_id}"
            )
            self.occ.refresh(
                assigned, idempotency_key=f"ivfocc:{ckpt_id}:{batch_id}"
            )

        writer = stream.writeStream.foreachBatch(fold).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def assignments(self) -> DataFrame:
        return self.assign_table.read()

    def cell_stats(self) -> DataFrame:
        return self.occ.read().select("centroid_id", "n_vectors")
