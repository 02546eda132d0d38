"""bloom_prefilter_join: exact-join equivalence (the Bloom filter must be
semantics-invisible — false positives removed by the real join, no false
negatives ever) plus the plan contract that makes it worth having: the probe
is map-side (broadcast) and the survivors' filter sits BELOW the real join,
so at scale the exchange only ever sees pre-pruned rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.joins import bloom_prefilter_join


def _frames(spark, n_big=5000, n_dim=40):
    big = spark.range(n_big).select(
        (F.col("id") % 997).alias("k"), (F.col("id") * 3).alias("v")
    )
    dim = spark.range(n_dim).select(
        (F.col("id") * 13 + 1).alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return big, dim


def test_equals_plain_inner_join(spark):
    big, dim = _frames(spark)
    got = bloom_prefilter_join(big, dim, "k", "dk")
    want = big.join(dim, big["k"] == dim["dk"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tiny_filter_still_exact(spark):
    # m_bits=64 saturates the filter — nearly everything is a false positive;
    # the verifying join must still produce the exact result.
    big, dim = _frames(spark, n_big=2000)
    got = bloom_prefilter_join(big, dim, "k", "dk", m_bits=64, depth=1)
    want = big.join(dim, big["k"] == dim["dk"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_null_keys_dropped_like_inner_join(spark):
    big = spark.createDataFrame(
        [(1, 10), (None, 20), (2, 30)], "k long, v long"
    )
    dim = spark.createDataFrame([(1, "a"), (None, "b")], "dk long, name string")
    got = bloom_prefilter_join(big, dim, "k", "dk").select("k", "v", "name").collect()
    assert [tuple(r) for r in got] == [(1, 10, "a")]


def test_probe_is_broadcast_and_filter_below_final_join(spark):
    big, dim = _frames(spark, n_big=50_000)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the REAL join onto the shuffle path (the 100 TB scenario:
        # dim too big to broadcast as a hash relation)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            bloom_prefilter_join(big, dim, "k", "dk")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the final join shuffles, the probe joins do not
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" in plan
    # the bit-test filter exists, and it runs below the sort-merge join's
    # exchange: everything after the SMJ header is the join's input subtree —
    # the bitwise AND probe must appear there, not above it
    smj_at = plan.index("SortMergeJoin")
    assert plan.find("&", smj_at) > 0


def test_cached_deps_released(spark):
    big, dim = _frames(spark)
    out = bloom_prefilter_join(big, dim, "k", "dk")
    assert out._cached_deps  # noqa: SLF001 — harness releases these
    out.count()
    from observation_lakehouse_spark.operators.dedup import release_cached

    release_cached(out)
