"""Deterministic hash sampling (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.sampling import (
    hash_sample,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("fr").alias("lang"),
    )


def test_sample_is_repartition_proof(docs):
    kept = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    shuffled = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13, "lang"), "doc_id", 0.2).collect()
    }
    assert kept == shuffled and 0 < len(kept) < 2000


def test_sample_fraction_is_approximate(docs):
    n = hash_sample(docs, "doc_id", 0.5).count()
    assert 0.4 < n / 2000 < 0.6


def test_sample_fraction_bounds(docs):
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_stratified_rates_and_unlisted_drop(docs):
    out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 1.0}).collect()
    assert {r["lang"] for r in out} == {"en"}
    assert len(out) == 500
    mixed = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "fr": 0.1}
    ).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in mixed}
    assert counts["en"] == 500 and 75 < counts["fr"] < 225


def test_weighted_sample_repartition_invariant(docs):
    from observation_lakehouse_spark.functions.sampling import weighted_sample

    dw = docs.withColumn("w", (F.col("doc_id") % 7) + 1)
    a = [r["doc_id"] for r in weighted_sample(dw, "doc_id", "w", 50).collect()]
    b = [
        r["doc_id"]
        for r in weighted_sample(dw.repartition(13, "lang"), "doc_id", "w", 50).collect()
    ]
    assert a == b and len(a) == 50


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.functions.sampling import weighted_sample

    # 100 heavy rows (w=1000) + 900 light rows (w=1): a 100-row sample should
    # be dominated by heavy rows (A-ES: P(keep) scales with weight).
    rows = [(i, 1000 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = weighted_sample(df, "doc_id", "w", 100).filter(F.col("doc_id") < 100).count()
    assert kept > 60


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from observation_lakehouse_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame([(1, 0), (2, -5), (3, 10)], "doc_id long, w long")
    got = weighted_sample(df, "doc_id", "w", 10).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_weighted_sample_rejects_priority_collision(spark):
    """`priority` is the output contract column; an input of that name must
    raise instead of being silently destroyed (ADVICE r03)."""
    from observation_lakehouse_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame([("a", 1.0, 9)], "id string, w double, priority long")
    with pytest.raises(ValueError, match="priority"):
        weighted_sample(df, "id", "w", 1)


def test_mixture_resample_moves_token_mass_toward_uniform(spark):
    from observation_lakehouse_spark.operators.text import mixture_resample

    # domain A dominates tokens 4:1 -> its rate must be ~4x lower than B's
    rows = [(i, "a " * 20, "A") for i in range(100)] + [
        (1000 + i, "b " * 5, "B") for i in range(100)
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = {r["domain"]: r for r in mixture_resample(df, target_frac=0.5).collect()}
    # token shares 80/20, uniform target 50/50: weights 0.625 and 2.5 ->
    # rates floor(0.5*0.625*1e6)=312500 and min(1, 1.25) clamped -> 1000000
    assert out["A"]["rate_ppm"] == 312500 and out["B"]["rate_ppm"] == 1000000
    assert out["B"]["n_sampled"] == 100  # rate 1.0 keeps everything
    # the deterministic sample is a fixed subset: re-running yields same count
    again = {r["domain"]: r["n_sampled"] for r in mixture_resample(df, target_frac=0.5).collect()}
    assert again["A"] == out["A"]["n_sampled"]


def test_cluster_safe_split_never_splits_a_cluster(spark):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.functions.sampling import cluster_safe_split

    clusters = spark.createDataFrame(
        [(i, i // 3) for i in range(60)], "doc_id long, cluster_id long"
    )
    out = cluster_safe_split(clusters, train_frac=0.5).collect()
    sides = {}
    for r in out:
        sides.setdefault(r["cluster_id"], set()).add(r["split"])
    # every cluster lands entirely on one side
    assert all(len(s) == 1 for s in sides.values())
    got = {r["split"] for r in out}
    assert got == {"train", "eval"}  # 0.5 over 20 clusters hits both sides
    # deterministic: a repartitioned input produces the identical split
    again = {
        (r["doc_id"], r["split"])
        for r in cluster_safe_split(clusters.repartition(7), 0.5).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in out}


def test_mixture_temperature_flattens_toward_uniform(spark):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.operators.text import mixture_temperature

    rows = [(i, "w " * 900, "big") for i in range(9)] + [(100, "w " * 100, "small")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["domain"]: r for r in mixture_temperature(docs, tau=0.5).collect()}
    w_big, w_small = out["big"]["weight_micro"], out["small"]["weight_micro"]
    mass_big, mass_small = out["big"]["n_tokens"], out["small"]["n_tokens"]
    # temperature pulls the ratio from mass ratio (81x) toward sqrt (9x)
    assert mass_big / mass_small == 81
    assert 8.5 < w_big / w_small < 9.5
    assert w_big + w_small <= 1_000_000  # floor slack only
    assert 1_000_000 - (w_big + w_small) <= 2


def test_kfold_assign_stable_and_in_range(spark):
    from observation_lakehouse_spark.functions.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: r.fold for r in kfold_assign(df, "doc_id", 5).collect()}
    b = {
        r.doc_id: r.fold
        for r in kfold_assign(df.repartition(7), "doc_id", 5).collect()
    }
    assert a == b  # repartition-proof
    assert set(a.values()) <= set(range(5))
    # roughly balanced (hash-uniform): every fold populated
    from collections import Counter

    c = Counter(a.values())
    assert len(c) == 5 and min(c.values()) >= 20


def test_kfold_assign_cluster_mode_keeps_clusters_together(spark):
    from observation_lakehouse_spark.functions.sampling import kfold_assign

    rows = [(i, f"c{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id string")
    got = kfold_assign(df, "doc_id", 4, cluster_col="cluster_id").collect()
    folds_per_cluster = {}
    for r in got:
        folds_per_cluster.setdefault(r.cluster_id, set()).add(r.fold)
    assert all(len(v) == 1 for v in folds_per_cluster.values())


def test_kfold_assign_rejects_k_below_2(spark):
    import pytest

    from observation_lakehouse_spark.functions.sampling import kfold_assign

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        kfold_assign(df, "doc_id", 1)


def test_kfold_assign_null_key_gets_a_fold(spark):
    """r7 advice: md5(NULL) propagates NULL, so NULL-keyed rows silently
    belonged to NO fold. Contract now: NULL keys hash the empty string —
    one deterministic fold, never NULL."""
    from observation_lakehouse_spark.functions.sampling import kfold_assign

    df = spark.createDataFrame(
        [(1, "c1"), (2, None), (3, None)], "doc_id long, cluster_id string"
    )
    got = {r.doc_id: r.fold for r in kfold_assign(df, "doc_id", 5, cluster_col="cluster_id").collect()}
    assert all(f is not None and 0 <= f < 5 for f in got.values())
    # all unknown-cluster rows share ONE fold (conservative leakage-safe)
    assert got[2] == got[3]
    # NULL key without cluster mode also never yields a NULL fold
    df2 = spark.createDataFrame([(None,), ("a",)], "doc_id string")
    got2 = [r.fold for r in kfold_assign(df2, "doc_id", 3).collect()]
    assert all(f is not None and 0 <= f < 3 for f in got2)
