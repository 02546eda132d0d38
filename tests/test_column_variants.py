"""The column-level hash/sketch variants must agree with the explode-based
operator implementations (same seeded families), so either shape can be used
when composing expressions."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.text import (
    hashed_shingles,
    hashed_word_shingles,
    minhash_signature,
    simhash64,
    tokens,
    word_shingles,
)
from observation_lakehouse_spark.operators.dedup import simhash_fingerprints

_MINHASH_PRIME = (1 << 31) - 1


def test_minhash_signature_matches_explode_impl(spark):
    """minhash_signature (column) and the dedup operator's explode+MIN shape
    share coefficients (seed 42) — slot values must be identical."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "a completely different sentence with other words entirely")],
        "doc_id long, text string",
    )
    base = docs.select(
        "doc_id", hashed_word_shingles("text", 3).alias("sh")
    ).persist()
    col_sig = {
        r["doc_id"]: r["sig"]
        for r in base.select(
            "doc_id", minhash_signature(F.col("sh"), 16).alias("sig")
        ).collect()
    }
    # replicate the operator's explode shape with the same seed
    rnd = random.Random(42)
    coeffs = [(rnd.randrange(1, _MINHASH_PRIME), rnd.randrange(0, _MINHASH_PRIME)) for _ in range(16)]
    p = F.lit(_MINHASH_PRIME).cast("long")
    exploded = base.select("doc_id", F.explode("sh").alias("h"))
    agg_sig = {
        r["doc_id"]: [r[f"s{i}"] for i in range(16)]
        for r in exploded.groupBy("doc_id")
        .agg(
            *[
                F.min(F.pmod(F.col("h") * F.lit(a).cast("long") + F.lit(b).cast("long"), p)).alias(f"s{i}")
                for i, (a, b) in enumerate(coeffs)
            ]
        )
        .collect()
    }
    assert col_sig == agg_sig


def test_simhash64_column_matches_operator(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zz")],
        "doc_id long, text string",
    )
    col_fp = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id",
            simhash64(F.transform(tokens("text"), lambda t: F.lower(t))).alias("fp"),
        ).collect()
    }
    op_fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert col_fp == op_fp


def test_hashed_shingles_consistent_with_word_shingles(spark):
    """hashed_shingles(word_shingles(text)) has the same cardinality as the
    string shingle set (modulo negligible collisions)."""
    docs = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    out = docs.select(
        F.size(word_shingles("text", 2)).alias("n_str"),
        F.size(F.array_distinct(hashed_shingles(word_shingles("text", 2)))).alias("n_hash"),
    ).collect()[0]
    assert out["n_str"] == out["n_hash"] == 5


def test_simhash64_empty_doc_is_zero_in_both_shapes(spark):
    """Empty/whitespace docs fingerprint to 0 in BOTH the column variant and
    the explode-based operator (locked equivalence contract — the md5 family
    yields NULL token hashes, never a seed constant)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
    )
    col_fp = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id",
            simhash64(F.transform(tokens("text"), lambda t: F.lower(t))).alias("fp"),
        ).collect()
    }
    op = {r["doc_id"]: r for r in simhash_fingerprints(docs).collect()}
    assert col_fp[1] == col_fp[2] == op[1]["simhash"] == op[2]["simhash"] == 0
    assert op[1]["n_tokens"] == 0 and op[3]["n_tokens"] == 1
    assert col_fp[3] == op[3]["simhash"] != 0
