"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — a repartition,
AQE re-plan, or appended file silently changes which rows it keeps. Pipeline
sampling must be a pure function of the DATA, so these operators key the
decision on a cross-engine content hash (the same md5-prefix family as the
dedup sketches, functions.text.tok_hash60): a row is kept iff
``hash(key) mod D < fraction·D``. Same rows in → same sample out, on any
cluster layout, in any engine (the SQL oracle reproduces the exact sample).

Scale: the predicate is a scan-level filter (pure codegen, no shuffle, no
state); stratified rates broadcast as a literal CASE over the stratum column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.text import tok_hash60

# Denominator for the keep decision: 1e6 gives ppm-resolution fractions while
# hash(key) mod D stays uniform (hash is 60-bit).
_D = 1_000_000


def hash_bucket(key: Column, modulus: int = _D) -> Column:
    """Uniform bucket in [0, modulus) from a content hash of ``key``.

    DuckDB twin: ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT %
    modulus``.
    """
    return F.pmod(tok_hash60(key.cast("string")), F.lit(modulus).cast("long"))


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash(key) lands under
    ``fraction`` of the bucket space. Repartition-proof and engine-portable."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col)) < int(fraction * _D))


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    languages, keep all rare ones). ``rates`` maps stratum value → fraction;
    strata not listed are DROPPED (rate 0), so the keep-set is explicit.

    The rate table folds into the plan as one literal CASE expression —
    at 100 TB this is still a scan-level filter with zero joins.
    """
    for stratum, fr in rates.items():
        if not 0.0 <= fr <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {fr}")
    threshold = F.lit(0).cast("long")
    for stratum, fr in rates.items():
        threshold = (
            F.when(F.col(stratum_col) == stratum, F.lit(int(fr * _D)).cast("long"))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key_col)) < threshold)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted top-k sample (Efraimidis–Spirakis A-ES).

    Each row gets priority ``u^(1/w)`` where ``u`` is a hash-derived uniform
    in (0, 1) — a pure function of the row's key, so the sample is
    repartition-proof and reproducible in any engine, exactly like
    :func:`hash_sample`. The k rows with the highest priority form a weighted
    sample without replacement (heavier rows win proportionally more often).
    Rows with non-positive weight are excluded.

    The priority is ROUNDED to 9dp before ranking (with the key as total
    tie-break) so engines whose pow() differs in the last ulp rank
    identically. Shape: scan-level projection + one TakeOrderedAndProject —
    no shuffle of payloads, the global top-k is merged from per-partition
    heaps (the same plan a LIMIT-after-ORDER BY gets).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if "priority" in df.columns:
        # `priority` is part of the OUTPUT contract; silently overwriting an
        # input column of that name would destroy user data.
        raise ValueError(
            "input already has a 'priority' column — rename it before "
            "weighted_sample (the sample priority is emitted under that name)"
        )
    # u in (0,1): (bucket + 1) / (D + 1) avoids both endpoints (u=0 would
    # zero every priority; u=1 would make weight irrelevant).
    u = (hash_bucket(F.col(key_col)) + 1).cast("double") / F.lit(float(_D + 1))
    prio = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", prio)
        .orderBy(F.desc("priority"), F.col(key_col))
        .limit(k)
    )


def cluster_safe_split(
    clusters: DataFrame,
    train_frac: float,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Leakage-safe train/eval split: the side is a content hash of the
    CLUSTER id, so every member of a near-duplicate cluster lands on the
    same side and no near-dup pair ever straddles the split — the
    train→test contamination Lee et al. (2021, "Deduplicating Training
    Data Makes Language Models Better") measure in benchmark leakage.
    Splitting on hash(doc_id) has no such guarantee: two near-identical
    docs hash independently and leak one into eval with p = 2·f·(1−f).

    Composes downstream of any cluster assignment
    (operators.graph.dedup_clusters over the repo's candidate-pair
    generators). The decision is the same repartition-proof content-hash
    predicate as :func:`hash_sample` — a scan-level projection on the
    (doc, cluster) table, zero additional shuffles, identical in any
    engine. Returns (id_col, cluster_col, split) with split in
    {'train', 'eval'}.
    """
    if not 0.0 <= train_frac <= 1.0:
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    side = F.when(
        hash_bucket(F.col(cluster_col).cast("string")) < int(train_frac * _D),
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return clusters.select(id_col, cluster_col, side.alias("split"))


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    cluster_col: str | None = None,
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    content-hash(key) mod k — repartition-proof, engine-portable
    (:func:`hash_bucket`'s md5 family), and stable across runs, so every
    training job in a sweep sees the identical partition without any
    shared state or RNG seed plumbing.

    ``cluster_col`` makes it LEAKAGE-SAFE k-fold (the k-way generalization
    of :func:`cluster_safe_split`): the fold is hashed from the near-dup
    CLUSTER id instead of the row key, so no near-duplicate pair ever
    splits across a train/validation boundary in ANY of the k rotations —
    per-fold contamination otherwise happens with probability
    ~2·(1/k)·(1−1/k) per near-dup pair.

    Scan-level projection, zero shuffles. Returns the input columns plus
    ``fold`` in [0, k).

    NULL contract: a NULL key (or NULL cluster id — e.g. a row that never
    entered the near-dup graph) hashes the empty string, so those rows land
    deterministically in ONE fold rather than silently belonging to no fold
    (md5(NULL) is NULL and would propagate — r7 advice). All-NULL-keyed
    rows therefore share a fold, which is the conservative leakage-safe
    choice: rows of unknown cluster can never straddle a boundary.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    basis = F.coalesce(
        F.col(cluster_col if cluster_col else key_col).cast("string"), F.lit("")
    )
    return df.withColumn(
        "fold", F.pmod(tok_hash60(basis), F.lit(int(k)).cast("long"))
    )
