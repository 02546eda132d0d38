"""Streaming IVF index (streaming/ann_index.py): maintained assignments must
be bit-identical to a batch ivf_assign_exact over the same delivered vectors,
occupancy must equal the assignment group counts, and both state tables must
survive checkpoint replay without duplication/double-counting."""

from __future__ import annotations

from observation_lakehouse_spark.operators.similarity import ivf_assign_exact
from observation_lakehouse_spark.streaming.ann_index import StreamingIvfIndex

SCHEMA = "vec_id long, embedding array<float>"
CENTS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

ROWS1 = [
    (1, [0.9, 0.1, 0.0]),
    (2, [0.1, 0.8, 0.1]),
    (3, [0.0, 0.2, 0.9]),
]
ROWS2 = [
    (4, [0.7, 0.3, 0.0]),
    (5, [0.0, 0.0, 1.0]),
]
ROWS3 = [(6, [0.5, 0.5, 0.1])]  # near the 0/1 boundary: exact rule decides


def _run(spark, idx, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = idx.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_assign(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.vec_id, r.centroid_id) for r in ivf_assign_exact(df, CENTS).collect()}


def test_stream_index_matches_batch_and_replays_safely(spark, tmp_path):
    idx = StreamingIvfIndex(spark, str(tmp_path / "state"), CENTS)
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, idx, landing, tmp_path / "ckpt")

    got = {(r.vec_id, r.centroid_id) for r in idx.assignments().collect()}
    assert got == _batch_assign(spark, ROWS1 + ROWS2)

    occ = {r.centroid_id: r.n_vectors for r in idx.cell_stats().collect()}
    want = {}
    for _, c in got:
        want[c] = want.get(c, 0) + 1
    assert occ == want

    # exactly-once for BOTH state tables on checkpoint replay
    va, vo = idx.assign_table.latest_version(), idx.occ.table.latest_version()
    _run(spark, idx, landing, tmp_path / "ckpt")
    assert idx.assign_table.latest_version() == va
    assert idx.occ.table.latest_version() == vo
    assert idx.assignments().count() == len(got)

    # late file folds in; maintained state == batch recompute over ALL rows
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, idx, landing, tmp_path / "ckpt")
    all_assign = {(r.vec_id, r.centroid_id) for r in idx.assignments().collect()}
    assert all_assign == _batch_assign(spark, ROWS1 + ROWS2 + ROWS3)
    occ3 = {r.centroid_id: r.n_vectors for r in idx.cell_stats().collect()}
    assert sum(occ3.values()) == 6


def test_cell_probe_is_partition_pruned(spark, tmp_path):
    idx = StreamingIvfIndex(spark, str(tmp_path / "state2"), CENTS)
    landing = tmp_path / "landing2"
    spark.createDataFrame(ROWS1 + ROWS2, SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, idx, landing, tmp_path / "ckpt2")
    probe = idx.assignments().filter("centroid_id = 1")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must land in PartitionFilters (hive pruning), not
    # as a post-scan data filter
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters")[1][:160]
