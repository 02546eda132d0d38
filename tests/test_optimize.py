"""AtomicParquetTable.optimize(): small-file compaction as a snapshot —
data identical before/after, right-sized files carried untouched, rewrites
never cross partition boundaries, prior snapshots stay time-travelable."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.types import LongType, StringType, StructField, StructType

from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = StructType(
    [StructField("pk", StringType()), StructField("x", LongType())]
)


def _mk(spark, tmp_path, name, partition_by=()):
    return AtomicParquetTable(
        spark, str(tmp_path / name), schema=SCHEMA, partition_by=partition_by
    )


def _rows(t):
    return sorted((r.pk, r.x) for r in t.read().collect())


def test_optimize_compacts_and_preserves_data(spark, tmp_path):
    t = _mk(spark, tmp_path, "opt1")
    for i in range(4):  # 4 appends -> >= 4 tiny files
        t.append(spark.createDataFrame([(f"a", i), ("b", 100 + i)], SCHEMA))
    before = _rows(t)
    n_before = len(t._manifest(t.latest_version())["files"])
    v_before = t.latest_version()

    out = t.optimize(target_file_bytes=64 << 20)
    assert out["rewritten"] == n_before and out["rewritten"] >= 4
    assert out["produced"] < out["rewritten"]
    assert _rows(t) == before
    # the pre-optimize snapshot still time-travels to the same data
    assert sorted((r.pk, r.x) for r in t.read(version=v_before).collect()) == before


def test_optimize_noop_when_files_right_sized(spark, tmp_path):
    t = _mk(spark, tmp_path, "opt2")
    t.append(spark.createDataFrame([("a", 1)], SCHEMA))
    v = t.latest_version()
    # target so small every file counts as right-sized
    out = t.optimize(target_file_bytes=2)
    assert out == {"rewritten": 0, "produced": 0, "carried": out["carried"], "version": v}
    assert t.latest_version() == v  # no commit happened


def test_optimize_respects_partition_boundaries(spark, tmp_path):
    t = _mk(spark, tmp_path, "opt3", partition_by=("pk",))
    for i in range(3):
        t.append(spark.createDataFrame([("p1", i), ("p2", 10 + i)], SCHEMA))
    before = _rows(t)
    t.optimize(target_file_bytes=64 << 20)
    assert _rows(t) == before
    files = t._manifest(t.latest_version())["files"]
    # hive layout intact: every file still lives under its pk=… directory
    assert all(Path(f).parent.name in ("pk=p1", "pk=p2") for f in files)
    # compacted: at most one file per partition now
    per = {}
    for f in files:
        per.setdefault(Path(f).parent.name, []).append(f)
    assert all(len(v) == 1 for v in per.values())


def test_optimize_skips_partitions_below_min_input(spark, tmp_path):
    t = _mk(spark, tmp_path, "opt4", partition_by=("pk",))
    t.append(spark.createDataFrame([("solo", 1)], SCHEMA))
    out = t.optimize(target_file_bytes=64 << 20, min_input_files=2)
    assert out["rewritten"] == 0  # single small file per partition: carried
