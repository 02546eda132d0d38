"""Optimized Product Quantization — a trained orthogonal rotation in front
of PQ (Ge et al., CVPR'13; the ``OPQ`` pre-transform FAISS composes as
``OPQd,IVFx,PQy``).

LLM-pipeline extension (the reference has no ANN surface — SURVEY.md §2
scopes it to relational analytics): PQ splits vectors into m CONTIGUOUS
sub-vectors, so correlated or unevenly-scaled dimensions that land in the
same slice waste code budget. OPQ learns one d×d orthogonal matrix R that
decorrelates and balances the subspaces, then product-quantizes ``R·x``
instead of ``x`` — same m×k bit budget, lower quantization error, better
ADC candidate ranking. Training follows the paper's two halves:

- **parametric init** (OPQ-P, §4): full-d PCA via :func:`~observation_
  lakehouse_spark.operators.pca.pca_train` (the r9 moment-pass machinery),
  then greedy *eigenvalue allocation* — principal directions are dealt to
  the m buckets so the per-bucket variance products balance.
- **non-parametric refinement** (OPQ-NP, §5): alternate (a) PQ training in
  the rotated space (:func:`~.similarity.train_pq_codebooks`, the existing
  distributed Lloyd), (b) the orthogonal Procrustes update
  ``R ← V·Uᵀ`` from ``SVD(Xᵀ·recon) = U·S·Vᵀ``.

Scale design
------------
- :func:`rotate_vectors` is the only per-corpus operator: posexplode →
  broadcast 1:1 wide weight table → ONE d-wide hash aggregate (map-side
  combinable, whole-stage codegen, no Python). Exact integer micro-unit
  sums (int64; |s| ≤ d·10¹²) divided and rounded ONCE, so both engines and
  any partitioning produce bit-identical rotated coordinates — the frozen
  rotation replays in ANSI SQL exactly like the PQ codebooks.
- Training moments never move vectors: the Procrustes factor ``Xᵀ·recon``
  collapses to the d·m·k sums ``T[i,mj,c] = Σ_{x: code(x,mj)=c} x_i`` (one
  explode + join + hash aggregate per round); only d×(m·k) partials reach
  the driver, where the d×d SVD is trivial. At 100 TB you train on a
  hash-sample — the IVF/PQ codebook contract.
- Determinism: rotated training inputs are exact-integer; ``Xᵀ·recon`` is
  rounded to 9 dp before the SVD (the pca_train convention); R freezes at
  6 dp every round, so an unchanged drop retrains byte-identically
  (scripts/refreeze.py --check governs drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _memo_local_df, pq_codes, train_pq_codebooks

__all__ = ["rotate_vectors", "rotate_matrix", "train_opq", "eigenvalue_allocation"]


def rotate_vectors(
    df: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) with every vector replaced by ``R·x``, exact to 6 dp.

    Relational and exact: x and R quantize to integer micro-units, each
    output coordinate is an int64 dot ``s = Σ x_micro·w_micro`` (one
    posexplode → broadcast wide-literal join → d-wide hash aggregate), and
    the ONLY float op is the final ``ROUND(s/10¹², 6)`` — the pq_encode
    dist_sq discipline, so the SQL oracle replays coordinates bit-for-bit
    and no shuffle order can drift a ulp.
    """
    d_out = len(rotation)
    d_in = len(rotation[0])
    wm = [[int(round(w * 1_000_000)) for w in row] for row in rotation]
    rows = [
        (dim, *[wm[od][dim] for od in range(d_out)]) for dim in range(d_in)
    ]
    schema = "dim int, " + ", ".join(f"w{od} long" for od in range(d_out))
    lit = _memo_local_df(df.sparkSession, rows, schema)
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "xf")
    ).select(
        id_col,
        "dim",
        F.round(F.col("xf").cast("double") * 1_000_000.0).cast("long").alias(
            "x_micro"
        ),
    )
    agg = (
        ex.join(F.broadcast(lit), "dim")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.col("x_micro") * F.col(f"w{od}")).alias(f"s{od}")
                for od in range(d_out)
            ]
        )
    )
    return agg.select(
        id_col,
        F.array(
            *[
                F.round(F.col(f"s{od}").cast("double") / F.lit(1e12), 6)
                for od in range(d_out)
            ]
        ).alias(vec_col),
    )


def rotate_matrix(
    matrix: list[list[float]], rotation: list[list[float]], round_to: int = 6
) -> list[list[float]]:
    """Driver-side ``M·Rᵀ`` for tiny literal matrices (e.g. the frozen IVF
    centroids entering the rotated space). Plain float math rounded once —
    both engines consume the identical resulting literals, so no cross-
    engine arithmetic ever runs on these."""
    d = len(rotation[0])
    return [
        [
            round(sum(row[j] * r[j] for j in range(d)), round_to)
            for r in rotation
        ]
        for row in matrix
    ]


def eigenvalue_allocation(
    eigenvalues: list[float], m: int
) -> list[list[int]]:
    """Greedy balanced-variance bucketing (Ge et al. §4.2): principal
    directions (sorted by eigenvalue DESC) are dealt one at a time to the
    capacity-``d/m`` bucket with the smallest log-variance product. Returns
    the m buckets as lists of component indices."""
    import math

    d = len(eigenvalues)
    if d % m != 0:
        raise ValueError(f"d={d} not divisible by m={m}")
    cap = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for i in range(d):
        open_b = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(open_b, key=lambda b: (logs[b], b))
        buckets[b].append(i)
        logs[b] += math.log(max(float(eigenvalues[i]), 1e-12))
    return buckets


def train_opq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    lloyd_iters: int = 5,
    n_rounds: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train the OPQ rotation + codebooks; returns ``{"rotation" (d×d, 6 dp),
    "codebooks" (m×k×d/m, 6 dp)}`` ready to freeze as literals.

    OPQ-P init (PCA + eigenvalue allocation) then ``n_rounds`` of OPQ-NP
    alternation; every round's R is rounded to 6 dp BEFORE it rotates the
    next round's training input, so the loop consumes exactly the literals
    a refreeze would freeze — an unchanged drop retrains byte-identically.
    """
    import numpy as np

    from .pca import pca_train

    first = corpus.select(F.size(F.col(vec_col)).alias("_d")).first()
    if first is None:
        raise ValueError("train_opq: empty corpus")
    d = int(first["_d"])
    sub = d // m
    # -- OPQ-P init: full-d PCA, eigenvalue-balanced bucket order ----------
    pca = pca_train(corpus, k=d, id_col=id_col, vec_col=vec_col)
    buckets = eigenvalue_allocation(pca["eigenvalues"], m)
    R = np.array(
        [pca["components"][pc] for bucket in buckets for pc in bucket],
        dtype=np.float64,
    )
    R = np.round(R, 6)
    cbs: list[list[list[float]]] = []
    for _ in range(n_rounds):
        rot = rotate_vectors(corpus, R.tolist(), id_col=id_col, vec_col=vec_col)
        cbs = train_pq_codebooks(
            rot, m=m, k=k, n_iters=lloyd_iters, id_col=id_col, vec_col=vec_col
        )
        codes = pq_codes(rot, cbs, vec_col=vec_col, id_col=id_col)
        # T[i, mj, c] = Σ_{x: code(x, mj) = c} x_i over the RAW corpus —
        # the whole Procrustes factor Xᵀ·recon from d·m·k running sums.
        ex = corpus.select(
            F.col(id_col).alias("_tid"),
            F.posexplode(F.col(vec_col)).alias("i", "x"),
        )
        t_rows = (
            ex.join(codes.withColumnRenamed("neighbor_id", "_tid"), "_tid")
            .groupBy("i", "m", "code")
            .agg(F.sum("x").alias("s"))
        ).collect()
        T = np.zeros((d, m, k))
        for r in t_rows:
            T[r["i"], r["m"], r["code"]] = r["s"]
        G = np.zeros((d, d))
        for mj in range(m):
            G[:, mj * sub : (mj + 1) * sub] = T[:, mj, :] @ np.array(cbs[mj])
        G = np.round(G, 9)
        U, _s, Vt = np.linalg.svd(G)
        R = np.round((U @ Vt).T, 6)
    rot = rotate_vectors(corpus, R.tolist(), id_col=id_col, vec_col=vec_col)
    cbs = train_pq_codebooks(
        rot, m=m, k=k, n_iters=lloyd_iters, id_col=id_col, vec_col=vec_col
    )
    return {
        "rotation": [[round(float(x), 6) for x in row] for row in R],
        "codebooks": [
            [[round(float(x), 6) for x in c] for c in cb] for cb in cbs
        ],
    }
