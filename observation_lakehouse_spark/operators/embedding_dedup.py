"""Embedding-cosine near-duplicate detection (dedup strategy #5).

Semantic near-dups the lexical strategies (sha256 / MinHash / SimHash /
n-gram Jaccard in :mod:`.dedup`) cannot see. The reference has no vector
operators at all (SURVEY.md §2.8: math surface is arithmetic only), so this is
pure extension territory — designed Spark-first for the 100 TB case.

Two paths:

- :func:`embedding_near_dup` (``hyperplanes=None``) — EXACT all-pairs via a
  *blocked* self-join: vectors are hashed into ``n_blocks`` id-blocks, the tiny
  (bi <= bj) block-pair relation is broadcast, and each block pair's cosine
  matrix is computed by an Arrow-batched ``applyInPandas`` with numpy. This is
  the canonical distributed all-pairs shape: shuffle volume is N·(B+1) input
  rows (not N² pairs), work parallelism is B(B+1)/2 independent tasks, and the
  O(N²·d) FLOPs run vectorized in numpy instead of per-pair JVM expression
  evaluation. (Measured on local[32] at 2k vectors: interpreted per-pair
  ``zip_with``/``aggregate`` ≈ 44 s, unrolled ``element_at`` chains ≈ 22 s —
  both land outside whole-stage codegen above the pair join — numpy blocks
  < 2 s.)
- with ``hyperplanes`` — APPROXIMATE: sign-LSH buckets
  (:func:`~observation_lakehouse_spark.operators.similarity.hyperplane_signature`)
  become the blocks; only same-bucket and Hamming-1-probe pairs are scored.
  Recall tunes with the number of planes; cross-bucket pairs beyond one bit
  flip are missed. At 100 TB this replaces the quadratic block sweep.

Determinism / oracle parity: the per-pair cosine is accumulated **in sequential
k-order over the dimension** (one fused outer-product accumulation per
component, float64), then divided by the *product* of the two sequentially
accumulated norms — the exact expression tree of the SQL oracle's
``list_dot_product(a,b)/(sqrt(list_dot_product(a,a))*sqrt(list_dot_product(b,b)))``,
so the float64 results are bit-identical and 6-dp rounding agrees. numpy's own
``matmul``/``sum`` (pairwise/BLAS summation) would NOT guarantee that. The
threshold is applied loosely (-1e-6) inside the UDF and exactly on the
Spark-side ROUNDED value, mirroring the oracle's predicate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_SCHEMA = "vec_id_a long, vec_id_b long, cos_raw double"


def _block_pair_scorer(threshold: float, dim: int):
    """Returns the applyInPandas function scoring one (bi, bj) block pair."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        same_block = bool(pdf["_bi"].iat[0] == pdf["_bj"].iat[0])
        a = pdf[pdf["_role"] == 0]
        b = a if same_block else pdf[pdf["_role"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cos_raw": []}).astype(
                {"vec_id_a": "int64", "vec_id_b": "int64", "cos_raw": "float64"}
            )
        ids_a = a["_id"].to_numpy()
        ids_b = b["_id"].to_numpy()
        A = np.stack(a["_uv"].to_numpy()).astype(np.float64)
        B = A if same_block else np.stack(b["_uv"].to_numpy()).astype(np.float64)
        # Sequential k-order accumulation == the oracle's list_dot_product.
        S = np.multiply.outer(A[:, 0], B[:, 0])
        na2 = A[:, 0] * A[:, 0]
        nb2 = B[:, 0] * B[:, 0]
        for k in range(1, dim):
            S += np.multiply.outer(A[:, k], B[:, k])
            na2 += A[:, k] * A[:, k]
            nb2 += B[:, k] * B[:, k]
        cos = S / (np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :])
        if same_block:
            keep = ids_a[:, None] < ids_b[None, :]
        else:  # cross-block: every pair once; orient a<b afterwards
            keep = np.ones_like(cos, dtype=bool)
        keep &= cos >= threshold - 1e-6  # loose; exact filter on rounded, Spark-side
        ia, ib = np.nonzero(keep)
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"vec_id_a": lo, "vec_id_b": hi, "cos_raw": cos[ia, ib]})

    return score


def auto_hyperplanes(dim: int, n_planes: int = 4, seed: int = 7) -> list[list[float]]:
    """The seeded Gaussian plane family used by ``hyperplanes='auto'`` — a
    plain literal matrix, so it folds into generated oracle SQL too."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hyperplanes: list[list[float]] | None | str = "auto",
    dim: int = 64,
    n_blocks: int = 16,
) -> DataFrame:
    """Pairs with cosine(embedding_a, embedding_b) >= ``threshold``.

    Returns (vec_id_a, vec_id_b, cosine_sim) with a < b, cosine rounded to
    6 dp, thresholded on the rounded value, sorted. See module docstring for
    the blocked-exact vs LSH-approximate paths and the determinism contract.

    The DEFAULT is the scale-safe sign-LSH blocked path (``'auto'`` = the
    seeded 4-plane family from :func:`auto_hyperplanes`): FLOPs are bounded by
    bucket sizes, not N². Pass ``hyperplanes=None`` explicitly to request the
    exact all-pairs sweep — the verification twin whose cost is quadratic in
    the corpus regardless of the blocking layout; at 100 TB that is a
    deliberate offline audit, never a default.
    """
    spark = emb.sparkSession
    if isinstance(hyperplanes, str):
        if hyperplanes != "auto":
            raise ValueError(f"hyperplanes must be a matrix, None, or 'auto' (got {hyperplanes!r})")
        hyperplanes = auto_hyperplanes(dim)
    if hyperplanes is None:
        blk = (F.col(id_col) % n_blocks).cast("int")
        bp = spark.createDataFrame(
            [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
            "_bi int, _bj int",
        )
    else:
        from observation_lakehouse_spark.operators.similarity import (
            hyperplane_signature,
        )

        blk = hyperplane_signature(vec_col, hyperplanes)
        # Bucket pairs = (b, b) plus (b, b^bit) — Hamming-1 multi-probe.
        buckets = emb.select(blk.alias("_b")).distinct()
        probes = buckets.select(
            F.col("_b").alias("_bi"),
            F.explode(
                F.array(
                    F.col("_b"),
                    *[
                        F.col("_b").bitwiseXOR(F.lit(1 << i).cast("long"))
                        for i in range(len(hyperplanes))
                    ],
                )
            ).alias("_bj"),
        )
        bp = probes.filter(F.col("_bi") <= F.col("_bj")).distinct()

    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_uv"), blk.alias("_blk"))
    side_a = F.broadcast(bp).join(base, F.col("_bi") == F.col("_blk")).select(
        "_bi", "_bj", "_id", "_uv", F.lit(0).alias("_role")
    )
    side_b = (
        F.broadcast(bp)
        .filter(F.col("_bi") != F.col("_bj"))
        .join(base, F.col("_bj") == F.col("_blk"))
        .select("_bi", "_bj", "_id", "_uv", F.lit(1).alias("_role"))
    )
    grouped = side_a.unionByName(side_b).groupBy("_bi", "_bj")
    scored = grouped.applyInPandas(_block_pair_scorer(threshold, dim), _PAIR_SCHEMA)
    out = scored.select(
        "vec_id_a", "vec_id_b", F.round("cos_raw", 6).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= F.lit(threshold))
    if hyperplanes is not None:
        # A pair can surface via several probe block-pairs.
        out = out.dropDuplicates(["vec_id_a", "vec_id_b"])
    return out.orderBy("vec_id_a", "vec_id_b")
