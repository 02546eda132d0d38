"""Principal-component analysis over embedding columns.

LLM-pipeline extension (the reference has no linear-algebra surface —
SURVEY.md §2.10 scopes its functions to hashing/normalization): PCA is the
standard dimensionality-reduction / whitening step in front of ANN and
embedding-dedup pipelines (e.g. OPQ rotates with exactly this machinery).
Follows the train-on-a-sample-then-freeze flow the ANN family established
(similarity.train_ivf_centroids): a distributed second-moment pass trains
the components once, the frozen literal matrix is what both the Spark query
and the SQL oracle replay.

Scale design
------------
- ``pca_train`` never moves vectors: the mean/Gram pass reduces to d + d²
  running sums (d=64 → 4 KB of state) via posexplode + hash aggregate —
  partials combine map-side, the shuffle carries (dim, dim2) cells, and only
  the d×d matrix reaches the driver for the (tiny, deterministic) numpy
  eigendecomposition. At 100 TB you train on a hash-sample (compose with
  functions.sampling.hash_sample) exactly like the IVF codebook.
- ``pca_project`` is explode + broadcast-joined literal weights + hash
  aggregate — whole-stage-codegen'd, no Python in the hot path, linear in
  n·d·k with map-side partial sums.
- Exactness: projections are ROUNDed once (the cosine-family discipline);
  variance shares are exact integer ppm over micro-unit squares (DECIMAL
  accumulation, no float totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _memo_local_df

__all__ = ["pca_train", "pca_project", "pca_variance_share"]


def pca_train(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train top-``k`` principal components with one distributed pass.

    Returns ``{"mean", "components" (k×d, unit, sign-fixed), "bias"
    (k, = ⟨mean, wᵢ⟩ so projecting needs no centering pass), "eigenvalues"}``
    — plain rounded floats, ready to freeze as literals.

    Determinism: the covariance matrix is rounded to 9 decimals before
    ``eigh`` (kills hash-aggregate float-order jitter, the IVF trainer's
    convention), and each eigenvector's sign is fixed by making its
    largest-|coordinate| entry positive (first index on ties), so an
    unchanged drop retrains byte-identically (refreeze --check).
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = corpus.select(
        F.col(id_col).alias("_id"), F.posexplode(F.col(vec_col)).alias("dim", "x")
    )
    moments = (
        e.groupBy("dim").agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    ).collect()
    if not moments:
        raise ValueError("pca_train: empty corpus")
    d = len(moments)
    n = moments[0]["n"]
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")
    m = np.zeros(d)
    for r in moments:
        m[r["dim"]] = r["s"] / n
    # Upper-triangle second moments, emitted MAP-SIDE from the carried array
    # (r10, was an _id self-join that pushed both n·d-row legs through an
    # exchange): each exploded (dim, x) row re-explodes the tail slice of its
    # own vector, so the n·d(d+1)/2 product rows are generated inside one
    # codegen stage and the ONLY exchange is the (dim, dim2) aggregate's,
    # which carries d² partials — vectors never shuffle.
    gram = (
        corpus.select(
            F.posexplode(F.col(vec_col)).alias("dim", "x"),
            F.col(vec_col).alias("_v"),
        )
        .select(
            "dim",
            "x",
            F.posexplode(F.expr(f"slice(_v, dim + 1, {d})")).alias("_j", "y"),
        )
        .select(
            "dim",
            (F.col("dim") + F.col("_j")).alias("dim2"),
            (F.col("x") * F.col("y")).alias("_p"),
        )
        .groupBy("dim", "dim2")
        .agg(F.sum("_p").alias("sxy"))
    ).collect()
    S = np.zeros((d, d))
    for r in gram:
        S[r["dim"], r["dim2"]] = r["sxy"]
        S[r["dim2"], r["dim"]] = r["sxy"]
    cov = np.round(S / n - np.outer(m, m), 9)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps, evs = [], []
    for idx in order:
        v = eigvecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([round(float(x), 6) for x in v])
        evs.append(round(float(eigvals[idx]), 9))
    bias = [round(float(np.dot(m, np.array(c))), 6) for c in comps]
    return {
        "mean": [round(float(x), 6) for x in m],
        "components": comps,
        "bias": bias,
        "eigenvalues": evs,
    }


def _weights_df(spark, components: list[list[float]], bias: list[float]):
    rows = [
        (pc, dim, float(w))
        for pc, comp in enumerate(components)
        for dim, w in enumerate(comp)
    ]
    wdf = _memo_local_df(spark, rows, "pc int, dim int, w double")
    bdf = _memo_local_df(
        spark,
        [(pc, float(b)) for pc, b in enumerate(bias)],
        "pc int, bias double",
    )
    return wdf, bdf


def pca_project(
    corpus: DataFrame,
    components: list[list[float]],
    bias: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Project each vector onto the frozen components.

    ``coord(pc) = ROUND(⟨x, w_pc⟩ − bias_pc, round_to)`` — the bias folds the
    mean-centering into one frozen scalar per component, so the plan is a
    single explode → broadcast weight join → hash aggregate (codegen; the
    r5 rule: explode + agg, never interpreted HOF lambdas in per-row math).
    Output: (id, pc, coord), one row per vector per component.
    """
    if len(bias) != len(components):
        raise ValueError("bias and components must have equal length")
    wdf, bdf = _weights_df(corpus.sparkSession, components, bias)
    e = corpus.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "x")
    )
    return (
        e.join(F.broadcast(wdf), "dim")
        .groupBy(id_col, "pc")
        .agg(F.sum(F.col("x") * F.col("w")).alias("_dot"))
        .join(F.broadcast(bdf), "pc")
        .select(
            id_col,
            "pc",
            F.round(F.col("_dot") - F.col("bias"), round_to).alias("coord"),
        )
    )


def pca_variance_share(
    corpus: DataFrame,
    components: list[list[float]],
    bias: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Variance share per component among the frozen top-k, in exact ppm.

    Coordinates quantize to integer micro-units (the composite-score
    discipline: ROUND(coord·10⁶) is integral-valued in both engines), squares
    accumulate in DECIMAL(38,0) (a BIGINT sum of micro² overflows past ~10⁹
    rows), and the share is an integer ``div`` against the k-row total — no
    float total anywhere, so the ppm ladder hash-matches at any SF.
    Output: (pc, n_vecs, var_share_ppm) ordered by pc.
    """
    coords = pca_project(
        corpus, components, bias, id_col=id_col, vec_col=vec_col, round_to=6
    )
    micro = F.round(F.col("coord") * F.lit(1000000.0), 0).cast("bigint")
    per_pc = coords.select("pc", micro.alias("_u")).groupBy("pc").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("_u") * F.col("_u")).cast("decimal(38,0)")).alias("_sumsq"),
    )
    # k-row total: bounded-cardinality unpartitioned window (k ≤ 64 rows).
    from pyspark.sql import Window

    total = F.sum("_sumsq").over(Window.partitionBy())
    return (
        per_pc.select(
            "pc",
            "n_vecs",
            F.expr("_sumsq").alias("_s"),
            total.alias("_t"),
        )
        .select(
            "pc",
            "n_vecs",
            F.expr("CAST(_s * 1000000 div _t AS BIGINT)").alias("var_share_ppm"),
        )
        .orderBy("pc")
    )
