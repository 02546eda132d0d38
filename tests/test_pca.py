"""PCA family: distributed train vs numpy, projection exactness, variance ppm."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.pca import (
    pca_project,
    pca_train,
    pca_variance_share,
)


def _corpus(spark, n=120, d=6, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic: stretch two directions so eigen-order is unambiguous
    base = rng.randn(n, d)
    base[:, 0] *= 4.0
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        base,
    )


@pytest.fixture(scope="module")
def trained(spark):
    df, X = _corpus(spark)
    out = pca_train(df, k=3)
    return df, X, out


def test_train_matches_numpy(trained):
    _, X, out = trained
    m = X.mean(0)
    cov = np.round((X.T @ X) / len(X) - np.outer(m, m), 9)
    w, v = np.linalg.eigh(cov)
    top = w[::-1][:3]
    assert np.allclose(out["eigenvalues"], top, atol=1e-6)
    # components orthonormal and spanning the same top subspace
    W = np.array(out["components"])
    assert np.abs(W @ W.T - np.eye(3)).max() < 1e-4
    V = v[:, np.argsort(w)[::-1][:3]]
    # |cos| of each trained component vs the numpy eigenvector ≈ 1
    cos = np.abs((W @ V).diagonal())
    assert cos.min() > 0.999


def test_sign_convention(trained):
    _, _, out = trained
    for comp in out["components"]:
        pivot = int(np.argmax(np.abs(comp)))
        assert comp[pivot] > 0


def test_project_matches_numpy(trained):
    df, X, out = trained
    W = np.array(out["components"])
    bias = np.array(out["bias"])
    got = {
        (r["vec_id"], r["pc"]): r["coord"]
        for r in pca_project(df, out["components"], out["bias"]).collect()
    }
    ref = X @ W.T - bias
    for i in range(len(X)):
        for pc in range(3):
            assert got[(i, pc)] == pytest.approx(round(float(ref[i, pc]), 6), abs=2e-6)


def test_variance_share_ppm(trained):
    df, _, out = trained
    rows = pca_variance_share(df, out["components"], out["bias"]).collect()
    assert [r["pc"] for r in rows] == [0, 1, 2]
    shares = [r["var_share_ppm"] for r in rows]
    # integer div truncation: total within k ppm of 1e6, never above
    assert 1_000_000 - 3 <= sum(shares) <= 1_000_000
    # stretched axes dominate, in order
    assert shares[0] > shares[1] > shares[2]
    assert all(r["n_vecs"] == 120 for r in rows)


def test_train_validates(spark, trained):
    df, _, _ = trained
    with pytest.raises(ValueError):
        pca_train(df, k=0)
    with pytest.raises(ValueError):
        pca_train(df, k=7)  # k > d
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError):
        pca_train(empty, k=2)


def test_train_deterministic(spark):
    df, _ = _corpus(spark, n=60, d=4, seed=9)
    a = pca_train(df, k=2)
    b = pca_train(df.repartition(7), k=2)
    assert a["components"] == b["components"]
    assert a["bias"] == b["bias"]


def test_frozen_pca_literals_are_consistent():
    """The frozen _PCA_COMPONENTS block must be an orthonormal-ish basis
    (unit rows, pairwise |cos| small) with one bias per component — the
    refreeze --check twin at test speed (catches a hand-edited block)."""
    import __spark_entry__ as e

    W = np.array(e._PCA_COMPONENTS)
    assert W.shape[1] == 64 and W.shape[0] == len(e._PCA_BIAS)
    norms = np.linalg.norm(W, axis=1)
    assert np.abs(norms - 1.0).max() < 1e-3  # rows rounded to 6dp
    G = W @ W.T - np.diag(norms**2)
    assert np.abs(G).max() < 1e-3
    # sign convention: largest-|coordinate| entry positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0
