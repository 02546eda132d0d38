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


def test_optimize_zorder_clusters_row_groups(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY on the atomic table: data identical, and the
    rewritten row groups are min/max-tight on BOTH z columns (checked on
    parquet footer stats, the same property test_plans pins for the
    plain-layout rewrite)."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("x", LongType()), StructField("y", LongType()),
         StructField("payload", LongType())]
    )
    t = AtomicParquetTable(spark, str(tmp_path / "zopt"), schema=schema)
    df = spark.range(200_000).selectExpr(
        "cast(id % 100 as long) as x",
        "cast(pmod(hash(id), 100) as long) as y",
        "id as payload",
    )
    t.append(df)
    before = t.read().agg({"payload": "sum"}).collect()[0][0]

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 256 * 1024)
    try:
        out = t.optimize(target_file_bytes=1 << 30, zorder_by=("x", "y"), zorder_bits=6)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)
    assert out["rewritten"] >= 1 and out["produced"] >= 1
    assert t.read().agg({"payload": "sum"}).collect()[0][0] == before

    # row-group tightness on BOTH dims: mean span well under the global span
    spans = {"x": [], "y": []}
    files = t._manifest(t.latest_version())["files"]
    for f in files:
        md = pq.ParquetFile(str(t.data_dir / f)).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    spans[name].append(col.statistics.max - col.statistics.min)
    for dim in ("x", "y"):
        assert spans[dim], dim
        mean_span = sum(spans[dim]) / len(spans[dim])
        assert mean_span < 99 * 0.7, (dim, mean_span)  # global span is 99
