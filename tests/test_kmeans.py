"""Exact fixed-point k-means (operators/kmeans.py): determinism,
partitioning-independence, empty-cluster rule, and agreement with a
transparent driver-side reference on a tiny planted-cluster fixture."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.kmeans import (
    kmeans_train_fixed_point,
    quantized_lanes,
)


def _planted(spark, per=20, d=4):
    """Three well-separated clusters around (-0.4, 0.0, +0.4) offsets."""
    rows = []
    vid = 0
    for ci, base in enumerate((-0.4, 0.0, 0.4)):
        for i in range(per):
            vec = [base + ((vid * 31 + j * 17) % 13 - 6) / 1000.0 for j in range(d)]
            rows.append((vid, vec, ci))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_recovers_planted_clusters_and_matches_reference(spark):
    df = _planted(spark)
    out = kmeans_train_fixed_point(df, k=3, n_rounds=3)
    rows = out.collect()
    assert len(rows) == 3 * 4
    sizes = {r["k"]: r["n_members"] for r in rows if r["pos"] == 0}
    # seeds are the 3 smallest ids — all in planted cluster 0, but Lloyd
    # still separates the well-spaced clusters within 3 rounds
    assert sum(sizes.values()) == 60

    # transparent reference: same integer arithmetic in plain Python
    lanes = {
        (r["id"], r["pos"]): r["e"] for r in quantized_lanes(df).collect()
    }
    ids = sorted({i for i, _ in lanes})
    d = 1 + max(p for _, p in lanes)
    cent = {k: [lanes[(ids[k], p)] for p in range(d)] for k in range(3)}
    for _ in range(3):
        assign = {}
        for i in ids:
            best = min(
                (sum((lanes[(i, p)] - cent[k][p]) ** 2 for p in range(d)) * 3 + k)
                for k in range(3)
            )
            assign[i] = best % 3
        for k in range(3):
            member = [i for i in ids if assign[i] == k]
            if member:
                # truncating DIV toward zero on possibly-negative sums
                cent[k] = [
                    (s // n if s >= 0 else -((-s) // n))
                    for p in range(d)
                    for s, n in [(sum(lanes[(i, p)] for i in member), len(member))]
                ]
    got = {(r["k"], r["pos"]): r["centroid_micro"] for r in rows}
    for k in range(3):
        for p in range(d):
            assert got[(k, p)] == cent[k][p], (k, p, got[(k, p)], cent[k][p])


def test_partitioning_independent(spark):
    df = _planted(spark, per=15)
    def run(d):
        return sorted(tuple(r) for r in kmeans_train_fixed_point(d, k=3, n_rounds=2).collect())
    assert run(df.repartition(1)) == run(df.repartition(16))


def test_validation(spark):
    df = _planted(spark, per=2)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_train_fixed_point(df, k=0)
    with pytest.raises(ValueError, match="n_rounds"):
        kmeans_train_fixed_point(df, k=2, n_rounds=0)
    with pytest.raises(ValueError, match="only"):
        kmeans_train_fixed_point(df.limit(2), k=5)
