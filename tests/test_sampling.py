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
