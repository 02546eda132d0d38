"""Layout advisor (plans/maintenance.py:layout_report): manifest-only health
metrics — overlap depth detects unclustered layouts, a sorted rewrite fixes
them, small-file pressure recommends compaction. No data scan: the report is
computed from the manifests + file sizes the table already maintains."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.plans.maintenance import layout_report
from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = "k long, v string"


def _table(spark, path):
    return AtomicParquetTable(spark, str(path), schema=_parse_datatype_string(SCHEMA))


def test_overlapping_appends_flag_sorting_and_rewrite_clears_it(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    # 5 appends, EACH spanning the full key domain -> every file overlaps
    for i in range(5):
        t.append(
            spark.range(0, 100).select(
                F.col("id").alias("k"), F.lit(f"b{i}").alias("v")
            ).coalesce(1)
        )
    rep = layout_report(t, ["k"], small_file_bytes=1)
    assert rep["n_files"] == 5
    assert rep["columns"]["k"]["stats_coverage"] == 1.0
    assert rep["columns"]["k"]["max_overlap_depth"] == 5
    assert rep["columns"]["k"]["expected_files_per_point_lookup"] == 5.0
    assert "sort_or_zorder(k)" in rep["recommendations"]

    # range-sorted rewrite (the S11 maintenance job): disjoint files
    data = t.read()
    staged = t.stage(data.repartitionByRange(5, "k").sortWithinPartitions("k"))
    t.commit_replace(staged)
    rep2 = layout_report(t, ["k"], small_file_bytes=1)
    assert rep2["columns"]["k"]["max_overlap_depth"] <= 2  # boundary touch only
    assert rep2["columns"]["k"]["expected_files_per_point_lookup"] <= 1.5
    assert not [r for r in rep2["recommendations"] if r.startswith("sort_or_zorder")]


def test_small_files_recommend_compaction(spark, tmp_path):
    t = _table(spark, tmp_path / "s")
    for i in range(6):
        t.append(
            spark.createDataFrame([(i, "x")], SCHEMA).coalesce(1)
        )
    rep = layout_report(t, ["k"])  # default 32 MiB threshold — all tiny
    assert rep["n_small_files"] == rep["n_files"] == 6
    assert "compact" in rep["recommendations"]
    # disjoint single-key files: perfectly clustered despite being small
    assert rep["columns"]["k"]["max_overlap_depth"] == 1
