"""token_budget_select: two-phase bin-threshold selection ≡ the naive
global-cumulative rule (the DuckDB oracle runs the naive form; these tests
re-prove the equivalence in-engine on adversarial shapes the testdata may
not exercise: zero-token docs, exact-fit boundaries, mass quality ties)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from observation_lakehouse_spark.operators.selection import token_budget_select


def _naive(df, budget_num=3, budget_den=5):
    """The single-window reference rule (what the SQL oracle computes)."""
    total = df.agg(F.sum("n_tokens")).collect()[0][0] or 0
    budget = (budget_num * total) // budget_den
    w = Window.orderBy(F.desc("quality_micro"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .select("doc_id", "quality_micro", "n_tokens")
    )


def _check(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, quality_micro long, n_tokens long")
    got = {tuple(r) for r in token_budget_select(df, **kw).collect()}
    want = {tuple(r) for r in _naive(df, **{k: v for k, v in kw.items() if k.startswith("budget")}).collect()}
    assert got == want


def test_matches_naive_on_pseudorandom_corpus(spark):
    import random

    rnd = random.Random(11)
    rows = [
        (i, rnd.randrange(0, 10_000_001), rnd.randrange(0, 400))
        for i in range(400)
    ]
    _check(spark, rows)


def test_zero_token_docs_and_ties(spark):
    # many docs sharing one quality value (single boundary bin does all the
    # tie-breaking by doc_id) + zero-token docs inside and below the boundary
    rows = [(i, 5_000_000, 10) for i in range(50)]
    rows += [(100 + i, 5_000_000, 0) for i in range(5)]
    rows += [(200 + i, 4_999_999, 7) for i in range(20)]
    _check(spark, rows)


def test_exact_fit_boundary(spark):
    # budget lands exactly on a document edge: cum == B is kept, next is cut
    rows = [(i, 10_000_000 - i, 100) for i in range(10)]  # total 1000, B=600
    _check(spark, rows)


def test_everything_fits_when_budget_is_total(spark):
    rows = [(i, i * 1000, 5) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, quality_micro long, n_tokens long")
    out = token_budget_select(df, budget_num=1, budget_den=1)
    assert out.count() == 30  # threshold row is empty -> keep-all path


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, quality_micro long, n_tokens long")
    assert token_budget_select(df).count() == 0


def test_doc_window_is_partitioned_by_bin(spark):
    """Plan contract: the only corpus-facing Window is partitioned by _bin —
    the unpartitioned cumulative exists solely over the n_bins histogram."""
    rows = [(i, (i * 37) % 10_000_001, i % 50) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, quality_micro long, n_tokens long")
    plan = token_budget_select(df)._jdf.queryExecution().executedPlan().toString()
    doc_windows = [
        ln
        for ln in plan.splitlines()
        if "Window [sum(n_tokens" in ln and "], [_bin" in ln
    ]
    assert doc_windows, plan  # the per-doc running total partitions by _bin


def test_stratified_sample_exact_k_and_proportional(spark):
    """r12 stratified_sample: per-stratum quotas are exact, the md5-rank
    sample is identical across partitionings (no RNG state), proportional
    allocation floors at 1 row per stratum, and validation is loud."""
    import hashlib

    import pytest

    from observation_lakehouse_spark.operators.selection import stratified_sample

    rows = [(i, "s1" if i < 40 else ("s2" if i < 50 else "s3")) for i in range(52)]
    df = spark.createDataFrame(rows, "id long, stratum string")

    out = stratified_sample(df, ["stratum"], 3, id_cols=["id"])
    by_s = {}
    for r in out.collect():
        by_s.setdefault(r["stratum"], []).append(r["id"])
    assert {k: len(v) for k, v in by_s.items()} == {"s1": 3, "s2": 3, "s3": 2}
    # the sample IS the md5-rank prefix, replayed here with hashlib
    for stratum, ids in by_s.items():
        pool = [i for i, s in rows if s == stratum]
        want = sorted(
            pool, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:3]
        assert sorted(ids) == sorted(want), stratum
    # partitioning-independence
    a = sorted(tuple(r) for r in stratified_sample(
        df.repartition(1), ["stratum"], 3, id_cols=["id"]).collect())
    b = sorted(tuple(r) for r in stratified_sample(
        df.repartition(13), ["stratum"], 3, id_cols=["id"]).collect())
    assert a == b

    # proportional: 20% of 40/10/2 with a floor of 1 -> 8/2/1
    prop = stratified_sample(
        df, ["stratum"], 200, id_cols=["id"], proportional_base=1000
    )
    sizes = {
        r["stratum"]: r["n"]
        for r in prop.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"s1": 8, "s2": 2, "s3": 1}

    with pytest.raises(ValueError, match="k_per_stratum"):
        stratified_sample(df, ["stratum"], 0, id_cols=["id"])
    with pytest.raises(ValueError, match="proportional_base"):
        stratified_sample(df, ["stratum"], 1, id_cols=["id"], proportional_base=0)
    with pytest.raises(ValueError, match="id column"):
        stratified_sample(df.select("stratum"), ["stratum"], 1)
