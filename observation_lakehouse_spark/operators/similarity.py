"""Embedding similarity search (LLM-pipeline extension).

Two paths over an ``array<float>`` embedding column:

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query set
  against the corpus, dot products via ``zip_with``+``aggregate`` (JVM-side, no
  UDF), per-query top-k via window. O(N·Q·d) FLOPs but embarrassingly parallel
  and shuffle-free except the final top-k — the right baseline, and the
  verifier for the approximate path.
- :func:`lsh_ann_topk` — approximate: random-hyperplane (sign) LSH buckets the
  corpus; each query probes only its own bucket(s), then exact re-ranking inside
  the probed set. At 100 TB the bucketed join replaces the full scan per query.

An IVF-style variant is :func:`ivf_assign` + :func:`cosine_topk` over one
partition: assign vectors to their nearest centroid (centroids supplied by the
caller — e.g. sampled k-means run offline), partition the table by
``centroid_id``, and probe ``nprobe`` centroids at query time.

Determinism: similarity values are rounded (6 dp) and ties broken by vector id,
so results are stable across partitionings and differential-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double") * x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns (double math, JVM-side)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus is scanned
    once, no shuffle until the per-query top-k (window over query_id — Q
    partitions). Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_signature(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (dot(v, h) >= 0).

    ``hyperplanes`` is a small literal matrix (seeded offline) — it folds into
    the plan as constants, so the signature is pure codegen.
    """
    sig = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(
            _dot(F.transform(vec, lambda x: x.cast("double")), arr) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(bit)
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's sign-LSH bucket(s).

    Recall/cost trade-off is the number of hyperplanes (bucket count = 2^H);
    with ``multi_probe`` each query also probes every Hamming-1 neighbor bucket
    (H+1 probes — the standard multi-probe LSH recall boost, which matters most
    for points near a hyperplane). Re-ranking inside the probed set is exact
    cosine. Same output schema as :func:`cosine_topk`.
    """
    n_planes = len(hyperplanes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), hyperplanes).alias("bucket"),
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), hyperplanes).alias("bucket"),
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        q_sig = q_sig.select(
            "query_id", "q_vec", F.explode(probes).alias("bucket")
        )
    q = F.broadcast(q_sig)
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias(
                "cosine_sim"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (centroids precomputed).

    Adds ``centroid_id``. Partition/bucket the output by it so ANN probes read
    ``nprobe`` cells instead of the whole corpus — the classic IVF-flat layout
    expressed as plain partitioning.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # One array of per-centroid sims + argmax via array_position. A chained
    # when(sim > best)-fold would reference the running best TWICE per step,
    # doubling the expression tree per centroid (2^K nodes — measured seconds
    # of eval per row at K=8); this stays linear in K. The row's own norm is a
    # positive scalar common to every sim, so the cosine argmax doesn't need it.
    sims = F.array(
        *[
            _dot(vec_d, F.array(*[F.lit(float(x)) for x in cent]))
            / F.lit(sum(x * x for x in cent) ** 0.5)
            for cent in centroids
        ]
    )
    return corpus.withColumn(
        "centroid_id", (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    )
