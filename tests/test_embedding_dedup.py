"""Embedding near-dup: blocked-exact semantics, orientation, LSH path."""

from __future__ import annotations

import math
import random

from observation_lakehouse_spark.operators.embedding_dedup import embedding_near_dup

DIM = 64


def _vec(seed: int) -> list[float]:
    rnd = random.Random(seed)
    return [rnd.uniform(-1, 1) for _ in range(DIM)]


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_exact_matches_bruteforce(spark):
    vecs = {i: _vec(i) for i in range(40)}
    # plant two near-dup pairs across different id blocks (ids 3 & 18, 7 & 7+16)
    vecs[18] = [x + 0.01 for x in vecs[3]]
    vecs[23] = [x * 1.001 for x in vecs[7]]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine_sim"]
        for r in embedding_near_dup(df, threshold=0.9, n_blocks=4, hyperplanes=None).collect()
    }
    # brute force in python over the float32-truncated vectors
    import numpy as np

    f32 = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in vecs.items()}
    want = {}
    for i in sorted(f32):
        for j in sorted(f32):
            if i < j:
                c = round(_cos(list(f32[i]), list(f32[j])), 6)
                if c >= 0.9:
                    want[(i, j)] = c
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert (3, 18) in got and (7, 23) in got


def test_pairs_are_oriented_and_sorted(spark):
    vecs = [(i, _vec(1)) for i in range(10)]  # all identical → all pairs
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = embedding_near_dup(df, threshold=0.99, n_blocks=3, hyperplanes=None).collect()
    assert len(rows) == 45
    pairs = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
    assert all(a < b for a, b in pairs)
    assert pairs == sorted(pairs)


def test_lsh_path_finds_identical_vectors(spark):
    """Identical vectors share the LSH signature, so the approximate path
    must always surface them."""
    rnd = random.Random(5)
    planes = [[rnd.gauss(0, 1) for _ in range(DIM)] for _ in range(6)]
    vecs = [(i, _vec(i)) for i in range(30)] + [(100, _vec(4)), (101, _vec(9))]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup(df, threshold=0.999, hyperplanes=planes).collect()
    }
    assert (4, 100) in got and (9, 101) in got


def test_auto_default_is_lsh_blocked_and_finds_identicals(spark):
    """The DEFAULT path is sign-LSH blocked (scale-safe): identical vectors
    share every signature bit, so they must always surface."""
    vecs = [(i, _vec(i)) for i in range(30)] + [(100, _vec(4)), (101, _vec(9))]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup(df, threshold=0.999).collect()
    }
    assert (4, 100) in got and (9, 101) in got


def test_knn_graph_ranks_within_cluster_only(spark):
    from observation_lakehouse_spark.operators.similarity import knn_graph

    # two well-separated clusters on axes 0 and 1; vectors inside a cluster
    # are slight perturbations so the nearest neighbor is unambiguous
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.98, 0.0, 0.02, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.99, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = {(r.vec_id, r.rank): r.neighbor_id for r in knn_graph(df, cents, k=2).collect()}
    # no edge ever crosses clusters
    assert got[(1, 1)] in (2, 3) and got[(1, 2)] in (2, 3)
    assert got[(10, 1)] == 11 and got[(11, 1)] == 10
    assert (10, 2) not in got  # only one cluster-mate available
    # 2 is closer to 1 than 3 is (cos(1,2) > cos(1,3))
    assert got[(1, 1)] == 2


def test_knn_graph_tie_breaks_on_neighbor_id(spark):
    from observation_lakehouse_spark.operators.similarity import knn_graph

    # 2 and 3 are IDENTICAL vectors -> cosine ties at 1.0; smaller id first
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.rank): r.neighbor_id for r in knn_graph(df, [[1.0, 0.0]], k=2).collect()}
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3
    assert got[(2, 1)] == 1 and got[(3, 1)] == 1


def test_knn_graph_multi_assign_bridges_cells_and_dedupes(spark):
    from observation_lakehouse_spark.operators.similarity import knn_graph

    # 1 sits BETWEEN the two centroid directions; with n_assign=2 it joins
    # both cells, so it can reach both 2 (cell 0) and 10 (cell 1) — with
    # single assignment it would see only its nearest cell's mates. 2 and 10
    # also land in both of their own two cells, so the (2, 10) pair would be
    # emitted twice without the dedupe aggregate — rank must stay 1..k with
    # no repeated neighbor.
    rows = [
        (1, [0.7, 0.7, 0.0, 0.0]),
        (2, [1.0, 0.05, 0.0, 0.0]),
        (10, [0.05, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = [
        (r.vec_id, r.rank, r.neighbor_id)
        for r in knn_graph(df, cents, k=3, n_assign=2).collect()
    ]
    by_src = {}
    for src, rank, nbr in got:
        by_src.setdefault(src, []).append((rank, nbr))
    # every vector reaches BOTH others exactly once, ranks contiguous
    for src, pairs in by_src.items():
        nbrs = [n for _, n in sorted(pairs)]
        assert len(nbrs) == len(set(nbrs)) == 2, (src, pairs)
        assert [r for r, _ in sorted(pairs)] == [1, 2]


def test_knn_graph_auto_codebook_default(spark):
    """centroids=None trains an auto_ivf_k-sized codebook from the corpus:
    with target_cell_size >= N everything lands in one cell and the graph
    equals the exact kNN graph."""
    from observation_lakehouse_spark.operators.similarity import auto_ivf_k, knn_graph

    assert auto_ivf_k(1000, target_cell_size=256) == 4
    assert auto_ivf_k(1000, target_cell_size=256, n_assign=2) == 8
    assert auto_ivf_k(0) == 1
    rows = [(i, [1.0 + 0.01 * i, 0.01 * (i % 3), 0.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = knn_graph(df, None, k=5, target_cell_size=16).collect()
    # one cell of 6 vectors -> complete graph: every vector has 5 neighbors
    per_src = {}
    for r in got:
        per_src.setdefault(r.vec_id, set()).add(r.neighbor_id)
    assert all(len(v) == 5 for v in per_src.values())


def test_knn_graph_oversized_cell_warning(spark):
    import warnings

    from observation_lakehouse_spark.operators.similarity import knn_graph

    rows = [(i, [1.0, 0.01 * i]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        knn_graph(df, [[1.0, 0.0]], k=1, target_cell_size=2).collect()
    assert any("cell occupancy" in str(x.message) for x in w)


def test_rp_rerank_uses_query_frame_vectors(spark):
    """r6 advice: the exact re-rank must score against the QUERY frame's own
    vectors — a query whose id collides with a DIFFERENT corpus vector (or
    is absent from the corpus) must still rank by its true similarity."""
    from observation_lakehouse_spark.operators.similarity import (
        rademacher_signs,
        rp_ann_topk,
    )

    corpus_rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<float>")
    # query id 3 carries a vector near axis 0 — NOT corpus row 3's axis-2
    # vector. Under the old corpus-lookup re-rank it would be scored as
    # axis-2 and rank 3 first; correctly it must rank 1 then 2.
    queries = spark.createDataFrame(
        [(3, [1.0, 0.05, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    signs = rademacher_signs(4, 4)
    got = [
        (r.rank, r.neighbor_id)
        for r in rp_ann_topk(
            corpus, queries, signs, k=2, candidates=3
        ).collect()
    ]
    assert sorted(got) == [(1, 1), (2, 2)], got


def test_knn_graph_asymmetric_probing(spark):
    """r9: probe_cells=p keeps the corpus single-assigned and fans each
    vector out to its p nearest cells as a QUERY — edge (x -> y) exists iff
    y's cell is among x's probes, each pair forming exactly once (no dedup
    aggregate). With 3 orthogonal cells and p=2: 1 (cell 0, probes {0, 1})
    reaches 2 (cell 0) and 10 (cell 1) but NOT 20 (cell 2); with p=3 it
    reaches all."""
    import pytest

    from observation_lakehouse_spark.operators.similarity import knn_graph

    rows = [
        (1, [1.0, 0.6, 0.3, 0.0]),   # cell 0; probe order 0, 1, 2
        (2, [1.0, 0.05, 0.0, 0.0]),  # cell 0
        (10, [0.05, 1.0, 0.0, 0.0]), # cell 1
        (20, [0.0, 0.05, 1.0, 0.0]), # cell 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    nbrs = {}
    for r in knn_graph(df, cents, k=3, probe_cells=2).collect():
        nbrs.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
    assert sorted(n for _, n in nbrs[1]) == [2, 10]          # cell 2 unprobed
    assert [r for r, _ in sorted(nbrs[1])] == [1, 2]          # contiguous ranks
    nbrs3 = {}
    for r in knn_graph(df, cents, k=3, probe_cells=3).collect():
        nbrs3.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
    assert sorted(n for _, n in nbrs3[1]) == [2, 10, 20]
    with pytest.raises(ValueError, match="probe_cells"):
        knn_graph(df, cents, k=3, probe_cells=4)
