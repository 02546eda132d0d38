"""Physical-plan assertions: the 100 TB design rules, checked on real plans.

Correct results are necessary; these tests pin the plans we *want* — filters
reaching the parquet scan, column pruning, dimension broadcast, maintenance
layout — so a regression in plan shape fails loudly even while results stay
right.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from observation_lakehouse_spark.plans.inspect import (
    assert_broadcast_join,
    assert_pushed_filters,
    explain_str,
)
from observation_lakehouse_spark.plans.maintenance import compact_sort_partitions
from observation_lakehouse_spark.sources import union_datasets, write_partitioned_parquet

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    assert_pushed_filters(df, "EqualTo(c_mktsegment,BUILDING)")
    plan = explain_str(df)
    # column pruning: the scan must not read unused columns like c_acctbal
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_acctbal" not in read_schema and "c_custkey" in read_schema


def test_entry_three_way_join_plan(spark):
    import __spark_entry__ as e

    df = e.q_three_way_join(spark, SF)
    assert_broadcast_join(df, count=2)
    assert_pushed_filters(df, "EqualTo(c_mktsegment,BUILDING)")
    # the fact table (lineitem) must NOT be shuffled: no Exchange above its scan
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan


def test_partitioned_write_prunes(spark, observations, tmp_path):
    out = str(tmp_path / "obs_part")
    write_partitioned_parquet(observations, out)
    scoped = spark.read.parquet(out).filter(
        (F.col("data_set_id") == "DSA") & (F.col("problem_id") == "p_001")
    )
    plan = explain_str(scoped)
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "problem_id" in pf_line


def test_compact_sort_partitions(spark, observations, tmp_path):
    out = str(tmp_path / "compacted")
    compact_sort_partitions(observations, out)
    root = Path(out)
    part_dirs = list(root.glob("data_set_id=*/problem_id=*"))
    assert len(part_dirs) == 4
    for d in part_dirs:
        files = [f for f in d.glob("*.parquet")]
        assert len(files) == 1  # compaction: one file per partition
    back = spark.read.parquet(out).filter(F.col("problem_id") == "p_000")
    assert back.count() == 400
    # rows are sorted within the file on the reference's designed sort order
    first_file = sorted(part_dirs[0].glob("*.parquet"))[0]
    import pyarrow.parquet as pq

    tbl = pq.read_table(first_file, columns=["implementation_id", "test_id", "step_id"])
    ids = tbl.column("implementation_id").to_pylist()
    assert ids == sorted(ids)


def test_union_datasets_schema_drift(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(2, "y", 3.0)], "id int, v string, extra double")
    out = union_datasets(a, b).orderBy("id").collect()
    assert [r["extra"] for r in out] == [None, 3.0]
    assert len(out) == 2


def test_pivot_with_explicit_values_skips_discovery(spark):
    """Supplying pivot values must avoid the extra distinct job Spark otherwise
    runs: with values given, building the plan triggers no Spark job at all."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    _ = li.groupBy("l_orderkey").pivot("l_returnflag", ["A", "N", "R"]).agg(
        F.max("l_extendedprice")
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
