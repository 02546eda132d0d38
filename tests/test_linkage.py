"""Semantics tests for operators/linkage.py (blocked fuzzy matching) and
operators/similarity.py:semantic_dedup (cluster-then-dedup)."""

from __future__ import annotations

import itertools

from observation_lakehouse_spark.operators.linkage import fuzzy_match_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_brute_force(spark):
    names = [
        "red widget", "red widgets", "bed widget", "blue bolt", "blue bolts",
        "large gizmo", "large gizmos", "small ring", "smallring", "entirely other",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_match_pairs(df, "p_name", max_dist=2).collect()
    }
    want = {
        (min(a, b), max(a, b), _lev(a, b))
        for a, b in itertools.combinations(names, 2)
        if _lev(a, b) <= 2
    }
    assert got == want and want  # non-empty, exactly the brute-force set


def test_fuzzy_pairs_emits_each_pair_once(spark):
    # duplicates in the input collapse via distinct; a pair appears once
    df = spark.createDataFrame(
        [("red rod",), ("red rod",), ("red rods",)], "p_name string"
    )
    rows = fuzzy_match_pairs(df, "p_name", max_dist=2).collect()
    assert len(rows) == 1 and rows[0]["dist"] == 1


def test_fuzzy_pairs_extra_block_restricts_scope(spark):
    df = spark.createDataFrame(
        [("red rod", "us"), ("red rods", "eu")], "p_name string, region string"
    )
    # cross-region pair is blocked away; same input without the block matches
    assert fuzzy_match_pairs(df, "p_name", 2, extra_block_col="region").count() == 0
    assert fuzzy_match_pairs(df, "p_name", 2).count() == 1


def test_semantic_dedup_flags_within_cluster_only(spark):
    from observation_lakehouse_spark.operators.similarity import semantic_dedup

    # two orthogonal centroids; ids 1,2 near c0 and near each other (dup);
    # id 3 near c1 (alone); id 4 between but assigned c1, far from 3.
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.02, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.1, 0.9, 0.70, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, centroids, 0.99).collect()}
    assert out[1]["centroid_id"] == 0 and not out[1]["is_duplicate"]  # keeper (min id)
    assert out[2]["centroid_id"] == 0 and out[2]["is_duplicate"]
    assert out[3]["centroid_id"] == 1 and not out[3]["is_duplicate"]
    assert out[4]["centroid_id"] == 1 and not out[4]["is_duplicate"]


def test_semantic_dedup_misses_cross_cluster_pair(spark):
    """The documented recall trade: a near-identical pair split across two
    cells is NOT flagged — that is SemDeDup's scale mechanism, pinned here so
    the semantics never silently change."""
    from observation_lakehouse_spark.operators.similarity import semantic_dedup

    centroids = [[1.0, 0.0], [0.0, 1.0]]  # cells meet at 45 degrees
    rows = [(1, [0.71, 0.70]), (2, [0.70, 0.71])]  # cos ~ 0.9998, cells 0 and 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, centroids, 0.9).collect()}
    assert {out[1]["centroid_id"], out[2]["centroid_id"]} == {0, 1}
    assert not out[1]["is_duplicate"] and not out[2]["is_duplicate"]


def test_fuzzy_pairs_with_block_report_pair_once_across_blocks(spark):
    # same close pair present in TWO regions: one output row, not two
    df = spark.createDataFrame(
        [("red rod", "us"), ("red rod", "eu"), ("red rods", "us"), ("red rods", "eu")],
        "p_name string, region string",
    )
    rows = fuzzy_match_pairs(df, "p_name", 2, extra_block_col="region").collect()
    assert len(rows) == 1 and rows[0]["dist"] == 1
