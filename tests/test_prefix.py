"""Tests for the distributed global prefix sum and sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.prefix import global_prefix_sum


def test_global_prefix_sum_matches_single_partition_window(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13 + 1).alias("v")
    )
    got = global_prefix_sum(df, "k", "v", num_partitions=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("prefix_sum", F.coalesce(F.sum("v").over(w), F.lit(0)))
    g = {r["k"]: r["prefix_sum"] for r in got.collect()}
    e = {r["k"]: r["prefix_sum"] for r in want.collect()}
    assert g == e
    # first row's exclusive sum is zero; last equals total minus its value
    assert g[0] == 0


def test_global_prefix_sum_guards_reserved_columns(spark):
    df = spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("prefix_sum"))
    with pytest.raises(ValueError, match="prefix_sum"):
        global_prefix_sum(df, "k", "prefix_sum")


def test_pack_sequences_boundary_semantics(spark):
    from observation_lakehouse_spark.operators.text import pack_sequences

    rows = [
        (1, "a b c"),          # 3 tokens, offset 0
        (2, ""),               # dropped
        (3, "d e f g"),        # 4 tokens, offset 3 -> spans the 5-boundary
        (4, "h"),              # offset 7, seq 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=5).collect()}
    assert 2 not in out
    assert out[1]["stream_offset"] == 0 and out[1]["seq_id"] == 0
    assert not out[1]["spans_boundary"]
    assert out[3]["stream_offset"] == 3 and out[3]["seq_id"] == 0
    assert out[3]["spans_boundary"]  # tokens 3..6 cross offset 5
    assert out[4]["stream_offset"] == 7 and out[4]["seq_id"] == 1
    assert out[4]["offset_in_seq"] == 2
