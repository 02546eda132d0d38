"""Connected components + duplicate-cluster resolution (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _comps(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        (r["node"], r["component"])
        for r in connected_components(df, **kw).collect()
    }


# driver_threshold=0 forces the distributed pointer-jumping loop; the default
# takes the driver-side union-find path. Both must satisfy the same contract.
@pytest.mark.parametrize("kw", [{}, {"driver_threshold": 0}])
def test_two_components_and_chain(spark, kw):
    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds) + pair 10-11
    got = _comps(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], **kw)
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


@pytest.mark.parametrize("kw", [{}, {"driver_threshold": 0}])
def test_edge_direction_irrelevant(spark, kw):
    # labels must flow against edge direction too (symmetrized internally)
    assert _comps(spark, [(5, 1), (2, 5)], **kw) == {(1, 1), (2, 1), (5, 1)}


@pytest.mark.parametrize("kw", [{}, {"driver_threshold": 0}])
def test_empty_edges(spark, kw):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df, **kw).count() == 0


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, driver_threshold=0)


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0,
    }
    assert [d for d, r in rows.items() if r["is_canonical"]] == [0, 1, 2, 4]
    assert rows[5]["cluster_size"] == 3 and rows[1]["cluster_size"] == 1


def test_pagerank_ranks_popular_sink_first(spark):
    from observation_lakehouse_spark.operators.graph import pagerank

    # star: everyone links to hub; hub links to one spoke
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    out = pagerank(edges, n_iters=3).collect()
    assert out[0]["node"] == "hub"
    # integer pico-units: total mass never exceeds the injected scale
    assert sum(r["pr_pico"] for r in out) <= 1_000_000_000_000
    # 'a' receives the hub's entire (damped) mass -> outranks b/c/d
    by = {r["node"]: r["pr_pico"] for r in out}
    assert by["a"] > by["b"] == by["c"] == by["d"]


def test_pagerank_deterministic_across_partitionings(spark):
    from observation_lakehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(f"u{i}", f"u{(i * 7) % 23}") for i in range(100)], "src string, dst string"
    )
    a = [(r["node"], r["pr_pico"]) for r in pagerank(edges, n_iters=4).collect()]
    b = [
        (r["node"], r["pr_pico"])
        for r in pagerank(edges.repartition(13), n_iters=4).collect()
    ]
    assert a == b  # integer arithmetic: no plan/partitioning sensitivity
